#!/usr/bin/env python
"""Generate LPIPS golden values from the reference pip `lpips` package.

Run OFF-ENV (this build environment has zero egress, so neither torchvision
weights nor the lpips package are installable here):

    python tools/export_lpips_weights.py --out data/lpips_vgg16.npz
    python tools/make_lpips_golden.py   --out tests/golden/lpips_golden.npz

The golden file stores two deterministic 64x64 images and pip-lpips's VGG
distance between them; tests/test_lpips.py::test_golden_parity asserts the
JAX port (utils/lpips_jax.py) reproduces that number whenever both files are
present (it skips otherwise).  The image generator below is mirrored in the
test — keep them in sync.
"""

import argparse

import numpy as np


def golden_images():
    """Two deterministic structured images in [0, 1], [64, 64, 3]."""
    y, x = np.mgrid[0:64, 0:64].astype(np.float64) / 63.0
    a = np.stack([0.5 + 0.5 * np.sin(6.0 * x),
                  0.5 + 0.5 * np.cos(4.0 * y),
                  x * y], -1)
    b = np.stack([0.5 + 0.5 * np.sin(6.0 * x + 0.7),
                  y,
                  0.5 + 0.5 * np.cos(5.0 * (x + y))], -1)
    return a.astype(np.float32), b.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/golden/lpips_golden.npz")
    args = ap.parse_args()

    import torch
    import lpips as lpips_pkg

    a, b = golden_images()

    def to_torch(img):  # [H,W,3] in [0,1] -> [1,3,H,W] in [-1,1]
        return torch.from_numpy(img.transpose(2, 0, 1))[None] * 2.0 - 1.0

    net = lpips_pkg.LPIPS(net="vgg").eval()
    with torch.no_grad():
        d = float(net(to_torch(a), to_torch(b)))
        d_self = float(net(to_torch(a), to_torch(a)))
    np.savez(args.out, img_a=a, img_b=b, distance=np.float64(d),
             distance_self=np.float64(d_self))
    print(f"wrote {args.out}: lpips(a,b)={d:.6f} lpips(a,a)={d_self:.2e}")


if __name__ == "__main__":
    main()
