"""D-NeRF synthetic dataset loader (Blender + per-frame time).

Port of the reference loader (examples/datasets/dnerf_synthetic.py, unused
by the CNC entry points — SURVEY.md §2.6): transforms_{split}.json with a
`time` field per frame; rays carry timestamps for time-conditioned fields
(models/mlp_fields.py with time_input=True).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import cameras


def _load_split(root: str, subject: str, split: str):
    import imageio.v2 as imageio
    data_dir = os.path.join(root, subject)
    with open(os.path.join(data_dir, f"transforms_{split}.json")) as fp:
        meta = json.load(fp)
    images, poses, times = [], [], []
    for frame in meta["frames"]:
        fname = os.path.join(data_dir, frame["file_path"] + ".png")
        images.append(imageio.imread(fname))
        poses.append(frame["transform_matrix"])
        times.append(frame.get(
            "time", float(len(times)) / max(len(meta["frames"]) - 1, 1)))
    h, w = images[0].shape[:2]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    return (np.stack(images), np.stack(poses).astype(np.float32),
            np.asarray(times, np.float32), focal)


class SubjectLoaderDNeRF:
    OPENGL_CAMERA = True

    def __init__(self, subject_id: str, root_fp: str, split: str,
                 num_rays: Optional[int] = None):
        images, poses, times, focal = _load_split(root_fp, subject_id, split)
        self.HEIGHT, self.WIDTH = images.shape[1:3]
        rgba = images.astype(np.float32) / 255.0
        self.rgbs = jnp.asarray(rgba[..., :3])
        self.alphas = jnp.asarray(rgba[..., 3:] if rgba.shape[-1] == 4
                                  else np.ones_like(rgba[..., :1]))
        self.camtoworlds = jnp.asarray(poses)
        self.timestamps = jnp.asarray(times)
        self.K = jnp.asarray([[focal, 0, self.WIDTH / 2.0],
                              [0, focal, self.HEIGHT / 2.0],
                              [0, 0, 1]], jnp.float32)
        self.num_rays = num_rays
        self.training = num_rays is not None and split in ("train", "trainval")

    def __len__(self):
        return self.rgbs.shape[0]

    @property
    def ray_data(self):
        """Device-array pytree for jitted fetch (see scenes.ray_data)."""
        return {"rgbs": self.rgbs, "alphas": self.alphas,
                "camtoworlds": self.camtoworlds, "K": self.K,
                "timestamps": self.timestamps}

    def fetch_rays(self, key, num_rays: int, data=None):
        d = self.ray_data if data is None else data
        k1, k2, k3 = jax.random.split(key, 3)
        img = jax.random.randint(k1, (num_rays,), 0, len(self))
        x = jax.random.randint(k2, (num_rays,), 0, self.WIDTH)
        y = jax.random.randint(k3, (num_rays,), 0, self.HEIGHT)
        pixels = (d["rgbs"][img, y, x] * d["alphas"][img, y, x]
                  + 1.0 * (1.0 - d["alphas"][img, y, x]))
        rays = cameras.pixel_rays(d["K"], d["camtoworlds"][img], x, y)
        return rays, pixels, d["timestamps"][img]

    def image_and_rays(self, index: int):
        rays = cameras.image_rays(self.K, self.camtoworlds[index],
                                  self.WIDTH, self.HEIGHT)
        pixels = (self.rgbs[index] * self.alphas[index]
                  + 1.0 * (1.0 - self.alphas[index]))
        return rays, pixels, self.timestamps[index]
