"""LPIPS plumbing tests (synthetic weights — no pretrained VGG ships in this
environment; tools/export_lpips_weights.py produces real ones elsewhere)."""

import numpy as np
import pytest

from cnc_tpu.utils import lpips_jax, metrics


def synth_weights(seed=0):
    rng = np.random.default_rng(seed)
    w = {}
    cin = 3
    for i, (cout, _) in enumerate(lpips_jax._VGG_PLAN):
        w[f"conv{i}_w"] = (rng.standard_normal((3, 3, cin, cout))
                          .astype(np.float32) * np.sqrt(2.0 / (9 * cin)))
        w[f"conv{i}_b"] = np.zeros(cout, np.float32)
        cin = cout
    taps = [c for c, t in lpips_jax._VGG_PLAN if t]
    for j, c in enumerate(taps):
        w[f"lin{j}_w"] = rng.random(c).astype(np.float32)
    return w


class TestLpips:
    def test_identical_images_zero(self):
        rng = np.random.default_rng(1)
        img = rng.random((33, 41, 3)).astype(np.float32)
        d = lpips_jax.lpips(img, img, weights=synth_weights())
        assert d == pytest.approx(0.0, abs=1e-6)

    def test_positive_and_monotone_in_noise(self):
        rng = np.random.default_rng(2)
        img = rng.random((33, 41, 3)).astype(np.float32)
        small = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
        big = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
        w = synth_weights()
        d_small = lpips_jax.lpips(img, small.astype(np.float32), weights=w)
        d_big = lpips_jax.lpips(img, big.astype(np.float32), weights=w)
        assert 0 < d_small < d_big

    def test_missing_weights_is_none_not_nan(self, monkeypatch):
        monkeypatch.setattr(lpips_jax, "load_weights", lambda: None)
        assert metrics.lpips_fn(np.zeros((8, 8, 3), np.float32),
                                np.ones((8, 8, 3), np.float32)) is None

    def test_weight_file_roundtrip(self, tmp_path, monkeypatch):
        path = tmp_path / "lpips_vgg16.npz"
        np.savez(path, **synth_weights())
        monkeypatch.setenv("CNC_LPIPS_WEIGHTS", str(path))
        lpips_jax.load_weights.cache_clear()
        w = lpips_jax.load_weights()
        assert w is not None and "conv12_w" in w
        lpips_jax.load_weights.cache_clear()

    def test_golden_parity(self):
        """Numeric parity against pip `lpips` (VERDICT r2 #8).

        Activates when BOTH real VGG weights (data/lpips_vgg16.npz via
        tools/export_lpips_weights.py) and the golden file
        (tests/golden/lpips_golden.npz via tools/make_lpips_golden.py) are
        present; neither can be generated in this zero-egress environment,
        so the test skips here and runs wherever the artifacts are dropped.
        """
        import os
        import pathlib

        golden_path = pathlib.Path(__file__).parent / "golden" / \
            "lpips_golden.npz"
        if not golden_path.exists():
            pytest.skip("golden file not generated (needs pip lpips off-env)")
        lpips_jax.load_weights.cache_clear()
        w = lpips_jax.load_weights()
        if w is None or os.environ.get("CNC_LPIPS_WEIGHTS"):
            lpips_jax.load_weights.cache_clear()
            if w is None:
                pytest.skip("real VGG16 weights not present")
        g = np.load(golden_path)
        d = float(lpips_jax.lpips(g["img_a"], g["img_b"], weights=w))
        d_self = float(lpips_jax.lpips(g["img_a"], g["img_a"], weights=w))
        assert d == pytest.approx(float(g["distance"]), rel=1e-3)
        assert d_self == pytest.approx(float(g["distance_self"]), abs=1e-5)
