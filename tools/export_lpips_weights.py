#!/usr/bin/env python
"""Export torchvision VGG16 + lpips linear-head weights to the npz format
cnc_tpu.utils.lpips_jax consumes.

Run in any environment that has the checkpoints (this build environment has
zero egress, so the file must be produced elsewhere and dropped at
data/lpips_vgg16.npz or $CNC_LPIPS_WEIGHTS):

    python tools/export_lpips_weights.py --out data/lpips_vgg16.npz

Weights layout: conv{i}_w [kh, kw, in, out] (HWIO), conv{i}_b [out],
lin{j}_w [C] for the five tap layers.
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/lpips_vgg16.npz")
    args = ap.parse_args()

    import torch
    import torchvision
    import lpips as lpips_pkg

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    net = lpips_pkg.LPIPS(net="vgg").eval()

    out = {}
    ci = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            # torch OIHW -> jax HWIO
            out[f"conv{ci}_w"] = layer.weight.detach().numpy().transpose(
                2, 3, 1, 0)
            out[f"conv{ci}_b"] = layer.bias.detach().numpy()
            ci += 1
    for j, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{j}_w"] = w.reshape(-1)
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: {ci} convs, {j + 1} linear heads")


if __name__ == "__main__":
    main()
