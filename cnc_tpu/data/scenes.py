"""Procedural analytic scenes + ground-truth renderer.

The execution environment has no NeRF datasets on disk, so tests and
benchmarks synthesize them: an analytic density/color field is rendered to
ground-truth images with a dense brute-force volume integrator, producing a
self-consistent dataset in the reference's format (images + poses +
intrinsics).  Training against these images exercises the identical code
paths as Blender data.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cameras


class AnalyticScene(NamedTuple):
    sigma_fn: Callable    # [N,3] world -> [N] density
    rgb_fn: Callable      # [N,3] world -> [N,3] color in [0,1]
    aabb: Tuple[float, ...]


def _smooth_box(p, center, half, sharp=60.0):
    d = jnp.abs(p - jnp.asarray(center)) - jnp.asarray(half)
    dist = jnp.max(d, axis=-1)
    return jax.nn.sigmoid(-dist * sharp)


def _smooth_sphere(p, center, radius, sharp=60.0):
    dist = jnp.linalg.norm(p - jnp.asarray(center), axis=-1) - radius
    return jax.nn.sigmoid(-dist * sharp)


def make_scene(name: str = "blocks") -> AnalyticScene:
    """A lego-ish composition of boxes and spheres with spatially varying color."""
    if name == "blocks":
        def sigma_fn(p):
            s = (_smooth_box(p, (0.0, 0.0, -0.45), (0.7, 0.7, 0.12))      # base
                 + _smooth_box(p, (-0.25, 0.0, 0.0), (0.18, 0.45, 0.35))  # slab
                 + _smooth_sphere(p, (0.35, 0.25, 0.1), 0.28)             # ball
                 + _smooth_box(p, (0.3, -0.4, -0.05), (0.12, 0.12, 0.3))  # post
                 + _smooth_sphere(p, (-0.1, -0.35, 0.45), 0.18))
            return 80.0 * jnp.clip(s, 0.0, 1.0)

        def rgb_fn(p):
            base = 0.5 + 0.5 * jnp.sin(jnp.asarray([3.1, 5.3, 7.7]) * p
                                       + jnp.asarray([0.0, 1.3, 2.1]))
            return jnp.clip(base, 0.0, 1.0)

        return AnalyticScene(sigma_fn, rgb_fn, (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5))
    if name == "sphere":
        def sigma_fn(p):
            return 100.0 * _smooth_sphere(p, (0.0, 0.0, 0.0), 0.5)

        def rgb_fn(p):
            return jnp.clip(p * 0.5 + 0.5, 0.0, 1.0)

        return AnalyticScene(sigma_fn, rgb_fn, (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5))
    raise ValueError(name)


def render_gt_rays(scene: AnalyticScene, rays_o, rays_d, n_steps: int = 512,
                   bkgd=1.0):
    """Brute-force dense volume rendering of the analytic field."""
    aabb = jnp.asarray(scene.aabb)
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-10, 1e-10, rays_d)
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 0.0)
    tmax = jnp.min(jnp.maximum(t0, t1), -1)
    span = jnp.maximum(tmax - tmin, 1e-6)
    dt = span / n_steps                                         # [R]
    steps = jnp.arange(n_steps, dtype=jnp.float32) + 0.5
    t = tmin[:, None] + steps[None, :] * dt[:, None]            # [R, S]
    pos = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    flat = pos.reshape(-1, 3)
    sig = scene.sigma_fn(flat).reshape(t.shape)
    col = scene.rgb_fn(flat).reshape(t.shape + (3,))
    sdt = sig * dt[:, None]
    trans = jnp.exp(-(jnp.cumsum(sdt, axis=-1) - sdt))
    w = trans * (1.0 - jnp.exp(-sdt))
    rgb = jnp.sum(w[..., None] * col, axis=-2)
    opacity = jnp.sum(w, axis=-1, keepdims=True)
    return rgb + bkgd * (1.0 - opacity), opacity


class ProceduralDataset:
    """Reference-SubjectLoader-shaped dataset rendered from an analytic scene.

    Exposes: images [N,H,W,3] (white background), camtoworlds, K, and a
    device-side random ray batcher — the same contract the training driver
    uses for Blender data (nerf_synthetic.py:164-239).
    """

    def __init__(self, scene_name: str = "blocks", n_images: int = 24,
                 width: int = 128, height: int = 128, split: str = "train",
                 n_steps_gt: int = 512, seed: int = 0):
        self.scene = make_scene(scene_name)
        self.WIDTH, self.HEIGHT = width, height
        focal = 0.8 * width
        self.K = jnp.asarray([[focal, 0, width / 2.0],
                              [0, focal, height / 2.0],
                              [0, 0, 1]], jnp.float32)
        seed = seed + (1000 if split == "test" else 0)
        self.camtoworlds = jnp.asarray(cameras.look_at_poses(
            n_images, radius=3.2, seed=seed, full_sphere=True))
        imgs = []
        render = jax.jit(lambda o, d: render_gt_rays(self.scene, o, d,
                                                     n_steps_gt))
        for i in range(n_images):
            rays = cameras.image_rays(self.K, self.camtoworlds[i], width, height)
            rgb, _ = render(rays.origins.reshape(-1, 3),
                            rays.viewdirs.reshape(-1, 3))
            imgs.append(rgb.reshape(height, width, 3))
        self.images = jnp.stack(imgs)

    def __len__(self):
        return self.images.shape[0]

    @property
    def ray_data(self):
        """Device-array pytree for passing into jitted fetch (closure
        capture of the image stack costs ~7 s/MB of lowering on the tunneled
        TPU backend)."""
        return {"images": self.images, "camtoworlds": self.camtoworlds,
                "K": self.K}

    def fetch_rays(self, key, num_rays: int, data=None):
        """Random (image, pixel) ray batch, like SubjectLoader.fetch_data."""
        d = self.ray_data if data is None else data
        k1, k2, k3 = jax.random.split(key, 3)
        img = jax.random.randint(k1, (num_rays,), 0, len(self))
        x = jax.random.randint(k2, (num_rays,), 0, self.WIDTH)
        y = jax.random.randint(k3, (num_rays,), 0, self.HEIGHT)
        pixels = d["images"][img, y, x]
        rays = cameras.pixel_rays(d["K"], d["camtoworlds"][img], x, y)
        return rays, pixels

    def image_and_rays(self, index: int):
        rays = cameras.image_rays(self.K, self.camtoworlds[index],
                                  self.WIDTH, self.HEIGHT)
        return rays, self.images[index]
