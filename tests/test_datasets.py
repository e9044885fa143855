"""Real-data loader coverage via on-disk synthetic fixtures (VERDICT r2 #4).

Each reference dataset format gets a tiny generated fixture in the exact
on-disk layout, loaded through the real loader class — shape/convention bugs
surface here instead of on first real-data contact:

  * Blender nerf_synthetic: transforms_{split}.json + RGBA PNGs
    (reference examples/datasets/nerf_synthetic.py:53-239)
  * Tanks&Temples NSVF: rgb/{0_,1_}*.png + pose/*.txt + intrinsics.txt +
    bbox.txt (tanks.py:15-140)
  * D-NeRF: transforms with per-frame `time` (dnerf_synthetic.py)
  * mipnerf-360: COLMAP sparse/0/{cameras,images}.bin + images/
    (nerf_360_v2.py)

Plus a short end-to-end smoke train through the Blender fixture.
"""

import dataclasses
import json
import os
import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_train import tiny_config

W = H = 32


def _look_at_pose(eye):
    """OpenGL-style camera-to-world looking at the origin."""
    eye = np.asarray(eye, np.float64)
    fwd = -eye / np.linalg.norm(eye)          # camera looks along -z
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = -down                        # +y up (OpenGL)
    c2w[:3, 2] = -fwd                         # -z forward
    c2w[:3, 3] = eye
    return c2w


def _poses(n, radius=4.0):
    out = []
    for i in range(n):
        a = 2 * np.pi * i / n
        out.append(_look_at_pose([radius * np.cos(a), radius * np.sin(a),
                                  1.5]))
    return out


def _img(i, channels=4):
    rng = np.random.default_rng(100 + i)
    img = (rng.random((H, W, channels)) * 255).astype(np.uint8)
    if channels == 4:
        img[..., 3] = 255 * (np.arange(H * W).reshape(H, W) % 2)
    return img


# ------------------------------------------------------------- fixture gen
def make_blender_fixture(root, scene="chair", n_train=3, n_test=2,
                         with_time=False):
    import imageio.v2 as imageio
    d = os.path.join(root, scene)
    for split, n in (("train", n_train), ("val", 1), ("test", n_test)):
        os.makedirs(os.path.join(d, split), exist_ok=True)
        frames = []
        for i, pose in enumerate(_poses(n)):
            rel = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(d, f"{rel}.png"), _img(i))
            fr = {"file_path": rel, "transform_matrix": pose.tolist()}
            if with_time:
                fr["time"] = i / max(n - 1, 1)
            frames.append(fr)
        meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
        with open(os.path.join(d, f"transforms_{split}.json"), "w") as fh:
            json.dump(meta, fh)
    return root


def make_tanks_fixture(root, scene="Truck", n_train=3, n_test=2):
    import imageio.v2 as imageio
    d = os.path.join(root, scene)
    os.makedirs(os.path.join(d, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(d, "pose"), exist_ok=True)
    poses = _poses(n_train + n_test)
    for i in range(n_train + n_test):
        pre, j = ("0_", i) if i < n_train else ("1_", i - n_train)
        imageio.imwrite(os.path.join(d, "rgb", f"{pre}{j:04d}.png"),
                        _img(i, channels=3))
        np.savetxt(os.path.join(d, "pose", f"{pre}{j:04d}.txt"), poses[i])
    focal = 35.0
    intr = np.array([[focal, 0, W / 2, 0], [0, focal, H / 2, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
    np.savetxt(os.path.join(d, "intrinsics.txt"), intr)
    np.savetxt(os.path.join(d, "bbox.txt"),
               np.array([[-1, -1, -1, 1, 1, 1, 0.2]], np.float64))
    return root


def make_colmap_fixture(root, scene="garden", n=9):
    import imageio.v2 as imageio
    d = os.path.join(root, scene)
    sparse = os.path.join(d, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    img_dir = os.path.join(d, "images")
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))          # PINHOLE
        f.write(struct.pack("<4d", 35.0, 35.0, W / 2, H / 2))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n))
        for i, pose in enumerate(_poses(n)):
            w2c = np.linalg.inv(pose)
            r = w2c[:3, :3]
            t = w2c[:3, 3]
            tr = np.trace(r)
            qw = np.sqrt(max(tr + 1, 1e-9)) / 2
            qx = (r[2, 1] - r[1, 2]) / (4 * qw)
            qy = (r[0, 2] - r[2, 0]) / (4 * qw)
            qz = (r[1, 0] - r[0, 1]) / (4 * qw)
            name = f"img_{i:03d}.png"
            imageio.imwrite(os.path.join(img_dir, name), _img(i, channels=3))
            f.write(struct.pack("<I", i + 1))
            f.write(struct.pack("<4d", qw, qx, qy, qz))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<I", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))                  # no 2D points
    return root


# ------------------------------------------------------------------ tests
def test_blender_loader(tmp_path):
    from cnc_tpu.data.nerf_synthetic import SubjectLoader

    root = make_blender_fixture(str(tmp_path))
    tr = SubjectLoader("chair", root, "train", num_rays=64)
    te = SubjectLoader("chair", root, "test")
    tv = SubjectLoader("chair", root, "trainval")
    assert len(tr) == 3 and len(te) == 2 and len(tv) == 4
    assert tr.WIDTH == W and tr.HEIGHT == H
    rays, pixels = tr.fetch_rays(jax.random.PRNGKey(0), 64)
    assert rays.origins.shape == (64, 3) and pixels.shape == (64, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays.viewdirs), axis=-1), 1.0, atol=1e-5)
    rays_i, img = te.image_and_rays(0)
    assert rays_i.origins.shape == (H, W, 3) and img.shape == (H, W, 3)
    # white background composited where alpha == 0
    a = np.asarray(te.alphas[0, ..., 0])
    assert np.all(np.asarray(img)[a == 0] == 1.0)
    # fetch also works through the jit-arg pytree path (trainer usage)
    fetch = jax.jit(lambda k, d: tr.fetch_rays(k, 64, data=d))
    rays2, pixels2 = fetch(jax.random.PRNGKey(0), tr.ray_data)
    np.testing.assert_allclose(np.asarray(pixels2), np.asarray(pixels))


def test_tanks_loader(tmp_path):
    from cnc_tpu.data.tanks import SubjectLoaderTanks, load_scene_bbox

    root = make_tanks_fixture(str(tmp_path))
    tr = SubjectLoaderTanks("Truck", root, "train", num_rays=32)
    te = SubjectLoaderTanks("Truck", root, "test")
    assert len(tr) == 3 and len(te) == 2
    aabb, step = load_scene_bbox(root, "Truck")
    np.testing.assert_allclose(aabb, np.array([-1.2, -1.2, -1.2,
                                               1.2, 1.2, 1.2]), atol=1e-6)
    assert step == 4e-3          # bbox step 0.2 >= 0.15 -> 4e-3 quantization
    rays, pixels = tr.fetch_rays(jax.random.PRNGKey(1), 32)
    assert rays.origins.shape == (32, 3) and pixels.shape == (32, 3)
    rays_i, img = te.image_and_rays(1)
    assert img.shape == (H, W, 3)
    # OpenCV convention: +z forward — image rays at the center pixel point
    # along the camera's +z column
    c2w = np.asarray(te.camtoworlds[1])
    center = np.asarray(rays_i.viewdirs)[H // 2, W // 2]
    assert np.dot(center, c2w[:3, 2]) > 0.9


def test_dnerf_loader(tmp_path):
    from cnc_tpu.data.dnerf_synthetic import SubjectLoaderDNeRF

    root = make_blender_fixture(str(tmp_path), scene="lego", with_time=True)
    tr = SubjectLoaderDNeRF("lego", root, "train", num_rays=16)
    assert len(tr) == 3
    np.testing.assert_allclose(np.asarray(tr.timestamps), [0.0, 0.5, 1.0])
    rays, pixels, t = tr.fetch_rays(jax.random.PRNGKey(2), 16)
    assert t.shape == (16,) and pixels.shape == (16, 3)
    rays_i, img, t0 = tr.image_and_rays(2)
    assert float(t0) == 1.0 and img.shape == (H, W, 3)


def test_nerf360_loader(tmp_path):
    from cnc_tpu.data.nerf_360 import SubjectLoader360

    root = make_colmap_fixture(str(tmp_path), n=9)
    tr = SubjectLoader360("garden", root, "train", num_rays=16, factor=1)
    te = SubjectLoader360("garden", root, "test", factor=1)
    # every-8th image is test: indices {0, 8} of 9
    assert len(te) == 2 and len(tr) == 7
    assert tr.dist_params is None            # PINHOLE
    rays, pixels = tr.fetch_rays(jax.random.PRNGKey(3), 16)
    assert rays.origins.shape == (16, 3) and pixels.shape == (16, 3)
    # poses round-trip through the quaternion encoding: camera 0 (test idx 0)
    # sits at the generated eye position
    rays_i, _ = te.image_and_rays(0)
    eye = _poses(9)[0][:3, 3]
    np.testing.assert_allclose(np.asarray(rays_i.origins)[0, 0], eye,
                               atol=1e-4)


@pytest.mark.slow
def test_blender_smoke_train(tmp_path):
    """A few real training steps through the Blender fixture path."""
    from cnc_tpu.data.nerf_synthetic import SubjectLoader
    from cnc_tpu.train.trainer import Trainer

    root = make_blender_fixture(str(tmp_path))
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, max_steps=3))
    tr_ds = SubjectLoader("chair", root, "train",
                          num_rays=cfg.train.init_batch_size)
    trainer = Trainer(cfg, tr_ds)
    trainer.fit(max_steps=3, log_every=0)
    assert trainer.step >= 3
    ev = trainer.evaluate(SubjectLoader("chair", root, "test"), max_images=1)
    assert np.isfinite(ev["psnr"])


# --------------------------------------------- at-scale camera conventions
def _reference_rays_np(K, c2w, x, y):
    """Ray generation transcribed from the REFERENCE loader (examples/
    datasets/nerf_synthetic.py:202-222) in independent numpy: pixel-center
    +0.5 offsets, OpenGL y/z flips, c2w rotation applied as the reference's
    broadcast-multiply-sum."""
    dirs = np.stack([
        (x - K[0, 2] + 0.5) / K[0, 0],
        (y - K[1, 2] + 0.5) / K[1, 1] * -1.0,
        np.full(np.shape(x), -1.0)], -1)
    directions = (dirs[:, None, :] * np.asarray(c2w)[:3, :3]).sum(-1)
    origins = np.broadcast_to(np.asarray(c2w)[:3, -1], directions.shape)
    viewdirs = directions / np.linalg.norm(directions, axis=-1,
                                           keepdims=True)
    return origins, viewdirs


_SPHERES = [  # (center, radius, rgb) inside the [-1.5, 1.5] aabb
    (np.array([0.0, 0.0, 0.0]), 0.6, np.array([0.9, 0.15, 0.1])),
    (np.array([0.9, -0.6, 0.4]), 0.35, np.array([0.1, 0.8, 0.2])),
    (np.array([-0.8, 0.7, -0.5]), 0.45, np.array([0.15, 0.2, 0.95])),
]


def _trace_spheres(o, v):
    """Nearest-sphere flat-shaded raytrace -> (rgb [N,3], hit [N])."""
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


def make_sphere_blender_dataset(root, scene="spheres", n_train=2, res=800):
    """A REAL-SCALE (800x800) Blender-format dataset whose GT images come
    from an independent numpy raytracer using the reference's documented
    ray convention — so any deviation in the loader (offset, flip,
    transpose) shows up as massive color mismatch at sphere silhouettes."""
    import imageio.v2 as imageio
    d = os.path.join(root, scene)
    angle_x = 0.6911112070083618
    focal = 0.5 * res / np.tan(0.5 * angle_x)
    K = np.array([[focal, 0, res / 2.0], [0, focal, res / 2.0], [0, 0, 1]])
    x, y = np.meshgrid(np.arange(res, dtype=np.float64),
                       np.arange(res, dtype=np.float64), indexing="xy")
    x, y = x.ravel(), y.ravel()
    for split, n in (("train", n_train), ("val", 1), ("test", 1)):
        os.makedirs(os.path.join(d, split), exist_ok=True)
        frames = []
        for i, pose in enumerate(_poses(n)):
            o, v = _reference_rays_np(K, pose, x, y)
            rgb, hit = _trace_spheres(o, v)
            img = np.zeros((res * res, 4), np.uint8)
            img[:, :3] = np.round(rgb * 255)
            img[:, 3] = hit * 255
            rel = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(d, f"{rel}.png"),
                            img.reshape(res, res, 4))
            frames.append({"file_path": rel,
                           "transform_matrix": pose.tolist()})
        meta = {"camera_angle_x": angle_x, "frames": frames}
        with open(os.path.join(d, f"transforms_{split}.json"), "w") as fh:
            json.dump(meta, fh)
    return root, K


def test_blender_conventions_at_800(tmp_path):
    """VERDICT r3 missing #5: camera-convention errors invisible at 16^2
    fixture scale.  Loads an 800x800 Blender-format dataset (independent
    numpy-raytraced GT) through the real SubjectLoader and checks that
    rays regenerate the images: every loader ray, traced through the same
    sphere scene, must reproduce its pixel's color."""
    from cnc_tpu.data.nerf_synthetic import SubjectLoader

    root, K = make_sphere_blender_dataset(str(tmp_path))
    ds = SubjectLoader("spheres", root, "train")
    assert ds.WIDTH == 800 and ds.HEIGHT == 800
    np.testing.assert_allclose(np.asarray(ds.K), K, rtol=1e-6)

    # full-image rays (eval path)
    rays, pixels = ds.image_and_rays(0)
    o = np.asarray(rays.origins).reshape(-1, 3)
    v = np.asarray(rays.viewdirs).reshape(-1, 3)
    rgb, hit = _trace_spheres(o, v)
    want = np.where(hit[:, None], rgb, 1.0)          # white background
    got = np.asarray(pixels).reshape(-1, 3)
    mismatch = np.mean(np.any(np.abs(got - want) > 2 / 255.0, axis=-1))
    # only aliasing on the (exact, un-antialiased) silhouettes may differ
    assert mismatch < 1e-3, f"{mismatch:.2%} of 800^2 pixels disagree"

    # random-pixel training fetch path
    ds_tr = SubjectLoader("spheres", root, "train", num_rays=4096)
    rays, pixels = ds_tr.fetch_rays(jax.random.PRNGKey(0), 4096)
    o = np.asarray(rays.origins)
    v = np.asarray(rays.viewdirs)
    rgb, hit = _trace_spheres(o, v)
    want = np.where(hit[:, None], rgb, 1.0)
    got = np.asarray(pixels)
    mismatch = np.mean(np.any(np.abs(got - want) > 2 / 255.0, axis=-1))
    assert mismatch < 2e-3, f"{mismatch:.2%} of sampled rays disagree"


def test_tanks_conventions_at_1080p(tmp_path):
    """VERDICT r4 missing #5 prep: camera-convention errors invisible at
    fixture scale.  Generates a 1920x1080 NSVF-layout dataset (independent
    numpy raytracer, OpenCV convention) via tools/make_tanks_nsvf.py and
    loads it through the real SubjectLoaderTanks: every loader ray, traced
    through the same sphere scene, must reproduce its pixel's color, and
    bbox.txt must drive the aabb*1.2 + step-quantization rule."""
    import importlib.util

    from cnc_tpu.data.tanks import SubjectLoaderTanks, load_scene_bbox

    tool = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "make_tanks_nsvf.py")
    spec = importlib.util.spec_from_file_location("make_tanks_nsvf", tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.make_dataset(str(tmp_path), n_train=2, n_test=1)

    aabb, step = load_scene_bbox(str(tmp_path), "Spheres")
    np.testing.assert_allclose(aabb, [-1.56] * 3 + [1.56] * 3, rtol=1e-6)
    assert step == 4e-3                       # raw 0.2 >= 0.15 quantization

    ds = SubjectLoaderTanks("Spheres", str(tmp_path), "train")
    assert ds.WIDTH == 1920 and ds.HEIGHT == 1080
    assert not ds.OPENGL_CAMERA

    rays, pixels = ds.image_and_rays(0)
    o = np.asarray(rays.origins).reshape(-1, 3)
    v = np.asarray(rays.viewdirs).reshape(-1, 3)
    want = mod.trace(o, v)                    # white background baked in
    got = np.asarray(pixels).reshape(-1, 3)
    mismatch = np.mean(np.any(np.abs(got - want) > 2 / 255.0, axis=-1))
    assert mismatch < 1e-3, f"{mismatch:.2%} of 1080p pixels disagree"

    ds_tr = SubjectLoaderTanks("Spheres", str(tmp_path), "train",
                               num_rays=4096)
    rays, pixels = ds_tr.fetch_rays(jax.random.PRNGKey(0), 4096)
    want = mod.trace(np.asarray(rays.origins), np.asarray(rays.viewdirs))
    got = np.asarray(pixels)
    mismatch = np.mean(np.any(np.abs(got - want) > 2 / 255.0, axis=-1))
    assert mismatch < 2e-3, f"{mismatch:.2%} of sampled rays disagree"
