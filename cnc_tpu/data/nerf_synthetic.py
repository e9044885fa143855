"""NeRF-synthetic (Blender) dataset loader.

Behavioral port of the reference SubjectLoader (examples/datasets/
nerf_synthetic.py:53-239): transforms_{split}.json + PNG frames, 800x800,
OPENGL camera, white-background compositing of RGBA, random (image, pixel)
ray batches on device.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import cameras

SCENES = ["chair", "drums", "ficus", "hotdog", "lego", "materials", "mic",
          "ship"]


def _load_split(root: str, subject: str, split: str):
    import imageio.v2 as imageio
    data_dir = os.path.join(root, subject)
    with open(os.path.join(data_dir, f"transforms_{split}.json")) as fp:
        meta = json.load(fp)
    images, poses = [], []
    for frame in meta["frames"]:
        fname = os.path.join(data_dir, frame["file_path"] + ".png")
        images.append(imageio.imread(fname))
        poses.append(frame["transform_matrix"])
    images = np.stack(images, 0)
    poses = np.stack(poses, 0).astype(np.float32)
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    return images, poses, focal


class SubjectLoader:
    WIDTH, HEIGHT = 800, 800
    NEAR, FAR = 2.0, 6.0
    OPENGL_CAMERA = True

    def __init__(self, subject_id: str, root_fp: str, split: str,
                 num_rays: Optional[int] = None,
                 color_bkgd_aug: str = "white"):
        assert split in ("train", "val", "trainval", "test")
        self.split = split
        self.num_rays = num_rays
        self.training = num_rays is not None and split in ("train", "trainval")
        self.color_bkgd_aug = color_bkgd_aug
        if split == "trainval":
            i1, p1, f1 = _load_split(root_fp, subject_id, "train")
            i2, p2, _ = _load_split(root_fp, subject_id, "val")
            images = np.concatenate([i1, i2])
            poses = np.concatenate([p1, p2])
            focal = f1
        else:
            images, poses, focal = _load_split(root_fp, subject_id, split)
        self.HEIGHT, self.WIDTH = images.shape[1:3]
        # composite RGBA onto white once (the reference does it per fetch with
        # the same white background; "random" aug would need per-step work)
        rgba = images.astype(np.float32) / 255.0
        rgb, alpha = rgba[..., :3], rgba[..., 3:]
        self.alphas = jnp.asarray(alpha)
        self.rgbs = jnp.asarray(rgb)
        self.camtoworlds = jnp.asarray(poses)
        self.K = jnp.asarray([[focal, 0, self.WIDTH / 2.0],
                              [0, focal, self.HEIGHT / 2.0],
                              [0, 0, 1]], jnp.float32)

    def __len__(self):
        return self.rgbs.shape[0]

    def _composite(self, rgb, alpha, key):
        if self.training and self.color_bkgd_aug == "random":
            bkgd = jax.random.uniform(key, (3,))
        elif self.color_bkgd_aug == "black":
            bkgd = jnp.zeros(3)
        else:
            bkgd = jnp.ones(3)
        return rgb * alpha + bkgd * (1.0 - alpha), bkgd

    @property
    def ray_data(self):
        """Device-array pytree for jitted fetch (see scenes.ray_data)."""
        return {"rgbs": self.rgbs, "alphas": self.alphas,
                "camtoworlds": self.camtoworlds, "K": self.K}

    def fetch_rays(self, key, num_rays: int, data=None):
        d = self.ray_data if data is None else data
        k1, k2, k3, k4 = jax.random.split(key, 4)
        img = jax.random.randint(k1, (num_rays,), 0, len(self))
        x = jax.random.randint(k2, (num_rays,), 0, self.WIDTH)
        y = jax.random.randint(k3, (num_rays,), 0, self.HEIGHT)
        rgb = d["rgbs"][img, y, x]
        alpha = d["alphas"][img, y, x]
        pixels, _ = self._composite(rgb, alpha, k4)
        rays = cameras.pixel_rays(d["K"], d["camtoworlds"][img], x, y,
                                  opengl=self.OPENGL_CAMERA)
        return rays, pixels

    def image_and_rays(self, index: int):
        rays = cameras.image_rays(self.K, self.camtoworlds[index],
                                  self.WIDTH, self.HEIGHT,
                                  opengl=self.OPENGL_CAMERA)
        pixels, _ = self._composite(self.rgbs[index], self.alphas[index], None)
        return rays, pixels
