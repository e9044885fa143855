"""Mip-NeRF-360 unbounded capture loader (COLMAP layout).

Port of the reference loader (examples/datasets/nerf_360_v2.py, unused by
the CNC entry points — SURVEY.md §2.6).  The reference parses COLMAP binary
models through pycolmap; here a minimal pure-Python reader handles
`sparse/0/{cameras,images}.bin`, so no external dependency is needed.
Supports PINHOLE/SIMPLE_PINHOLE directly; distorted models expose their
parameters for utils/camera_undistort.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cameras

_CAM_MODELS = {0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4),
               2: ("SIMPLE_RADIAL", 4), 3: ("RADIAL", 5),
               4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8)}


def _read_cameras_bin(path: str) -> Dict[int, dict]:
    out = {}
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            cam_id, model, w, h = struct.unpack("<iiQQ", f.read(24))
            name, np_ = _CAM_MODELS.get(model, ("UNKNOWN", 0))
            params = struct.unpack(f"<{np_}d", f.read(8 * np_))
            out[cam_id] = {"model": name, "width": w, "height": h,
                           "params": np.asarray(params)}
    return out


def _read_images_bin(path: str):
    images = []
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            img_id = struct.unpack("<I", f.read(4))[0]
            qvec = struct.unpack("<4d", f.read(32))
            tvec = struct.unpack("<3d", f.read(24))
            cam_id = struct.unpack("<I", f.read(4))[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            n2d = struct.unpack("<Q", f.read(8))[0]
            f.read(24 * n2d)  # skip 2D points
            images.append({"id": img_id, "qvec": np.asarray(qvec),
                           "tvec": np.asarray(tvec), "camera_id": cam_id,
                           "name": name.decode()})
    return images


def _qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y]])


class SubjectLoader360:
    """Unbounded capture: every-8th image is the test split (standard
    mipnerf360 protocol, matching the reference loader)."""

    OPENGL_CAMERA = False

    def __init__(self, subject_id: str, root_fp: str, split: str,
                 num_rays: Optional[int] = None, factor: int = 4):
        import imageio.v2 as imageio
        data_dir = os.path.join(root_fp, subject_id)
        sparse = os.path.join(data_dir, "sparse", "0")
        cams = _read_cameras_bin(os.path.join(sparse, "cameras.bin"))
        imgs = _read_images_bin(os.path.join(sparse, "images.bin"))
        imgs.sort(key=lambda d: d["name"])
        img_dir = os.path.join(
            data_dir, f"images_{factor}" if factor > 1 else "images")

        sel = [i for i in range(len(imgs))
               if (i % 8 == 0) == (split == "test")]
        frames, poses = [], []
        cam = cams[imgs[0]["camera_id"]]
        for i in sel:
            meta = imgs[i]
            frames.append(imageio.imread(os.path.join(img_dir, meta["name"])))
            r = _qvec2rotmat(meta["qvec"])
            t = meta["tvec"]
            w2c = np.eye(4)
            w2c[:3, :3] = r
            w2c[:3, 3] = t
            poses.append(np.linalg.inv(w2c))
        images = np.stack(frames)
        self.HEIGHT, self.WIDTH = images.shape[1:3]
        scale = self.WIDTH / cam["width"]
        p = cam["params"]
        if cam["model"] == "SIMPLE_PINHOLE":
            fx = fy = p[0]
            cx, cy = p[1], p[2]
            self.dist_params = None
        elif cam["model"] == "PINHOLE":
            fx, fy, cx, cy = p[:4]
            self.dist_params = None
        else:
            fx, fy, cx, cy = p[0], p[0], p[1], p[2]
            self.dist_params = jnp.asarray(p[3:])
        self.K = jnp.asarray([[fx * scale, 0, cx * scale],
                              [0, fy * scale, cy * scale],
                              [0, 0, 1]], jnp.float32)
        self.rgbs = jnp.asarray(images[..., :3].astype(np.float32) / 255.0)
        self.camtoworlds = jnp.asarray(np.stack(poses).astype(np.float32))
        self.num_rays = num_rays
        self.training = num_rays is not None and split in ("train", "trainval")

    def __len__(self):
        return self.rgbs.shape[0]

    @property
    def ray_data(self):
        """Device-array pytree for jitted fetch (see scenes.ray_data)."""
        return {"rgbs": self.rgbs, "camtoworlds": self.camtoworlds,
                "K": self.K}

    def fetch_rays(self, key, num_rays: int, data=None):
        d = self.ray_data if data is None else data
        k1, k2, k3 = jax.random.split(key, 3)
        img = jax.random.randint(k1, (num_rays,), 0, len(self))
        x = jax.random.randint(k2, (num_rays,), 0, self.WIDTH)
        y = jax.random.randint(k3, (num_rays,), 0, self.HEIGHT)
        pixels = d["rgbs"][img, y, x]
        rays = cameras.pixel_rays(d["K"], d["camtoworlds"][img], x, y,
                                  opengl=False)
        return rays, pixels

    def image_and_rays(self, index: int):
        rays = cameras.image_rays(self.K, self.camtoworlds[index],
                                  self.WIDTH, self.HEIGHT, opengl=False)
        return rays, self.rgbs[index]
