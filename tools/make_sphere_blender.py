#!/usr/bin/env python
"""Generate a REAL-SCALE Blender-format dataset with independent GT.

Multi-view 800x800 RGBA renders of a flat-shaded sphere scene from a
standalone numpy raytracer that uses the reference loader's documented ray
convention (examples/datasets/nerf_synthetic.py:202-222).  The output is a
drop-in `--data_root` for train_cnc_nerf_synthetic.py, giving this
environment (which ships no NeRF datasets) an end-to-end run through the
REAL SubjectLoader path at the reference's 800^2 scale — loader-convention
parity itself is asserted by tests/test_datasets.py::
test_blender_conventions_at_800 against the same raytracer.

Usage: python tools/make_sphere_blender.py [out_root] [n_train] [res]
"""
import json
import os
import sys

import numpy as np

_SPHERES = [
    (np.array([0.0, 0.0, 0.0]), 0.6, np.array([0.9, 0.15, 0.1])),
    (np.array([0.9, -0.6, 0.4]), 0.35, np.array([0.1, 0.8, 0.2])),
    (np.array([-0.8, 0.7, -0.5]), 0.45, np.array([0.15, 0.2, 0.95])),
    (np.array([0.2, 0.9, 0.8]), 0.3, np.array([0.9, 0.8, 0.1])),
]


def look_at_pose(eye):
    eye = np.asarray(eye, np.float64)
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = -down
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = eye
    return c2w


def poses(n, radius=4.0, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        a = 2 * np.pi * i / n + rng.uniform(0, 0.1)
        z = rng.uniform(0.6, 2.2)
        out.append(look_at_pose([radius * np.cos(a), radius * np.sin(a), z]))
    return out


def reference_rays(K, c2w, x, y):
    dirs = np.stack([
        (x - K[0, 2] + 0.5) / K[0, 0],
        (y - K[1, 2] + 0.5) / K[1, 1] * -1.0,
        np.full(np.shape(x), -1.0)], -1)
    directions = (dirs[:, None, :] * c2w[:3, :3]).sum(-1)
    origins = np.broadcast_to(c2w[:3, -1], directions.shape)
    return origins, directions / np.linalg.norm(directions, axis=-1,
                                                keepdims=True)


def trace(o, v):
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    rgb = np.zeros((n, 3))
    for c, r, col in _SPHERES:
        oc = o - c
        b = np.sum(oc * v, -1)
        disc = b * b - (np.sum(oc * oc, -1) - r * r)
        ok = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        ok &= (t > 0) & (t < best_t)
        best_t = np.where(ok, t, best_t)
        rgb[ok] = col
    return rgb, np.isfinite(best_t)


def main():
    import imageio.v2 as imageio
    out_root = sys.argv[1] if len(sys.argv) > 1 else "data_spheres"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    d = os.path.join(out_root, "spheres")
    angle_x = 0.6911112070083618
    focal = 0.5 * res / np.tan(0.5 * angle_x)
    K = np.array([[focal, 0, res / 2.0], [0, focal, res / 2.0], [0, 0, 1]])
    x, y = np.meshgrid(np.arange(res, dtype=np.float64),
                       np.arange(res, dtype=np.float64), indexing="xy")
    x, y = x.ravel(), y.ravel()
    for split, n, seed in (("train", n_train, 0), ("val", 2, 1),
                           ("test", 3, 2)):
        os.makedirs(os.path.join(d, split), exist_ok=True)
        frames = []
        for i, pose in enumerate(poses(n, seed=seed)):
            o, v = reference_rays(K, pose, x, y)
            rgb, hit = trace(o, v)
            img = np.zeros((res * res, 4), np.uint8)
            img[:, :3] = np.round(rgb * 255)
            img[:, 3] = hit * 255
            rel = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(d, f"{rel}.png"),
                            img.reshape(res, res, 4))
            frames.append({"file_path": rel,
                           "transform_matrix": pose.tolist()})
        with open(os.path.join(d, f"transforms_{split}.json"), "w") as fh:
            json.dump({"camera_angle_x": angle_x, "frames": frames}, fh)
        print(f"{split}: {n} x {res}^2 images")
    print(f"dataset at {d}")


if __name__ == "__main__":
    main()
