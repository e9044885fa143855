"""Range-coder tests: roundtrip, rate optimality, C++/Python agreement."""

import numpy as np
import pytest

from cnc_tpu.codec import coder


def test_native_builds():
    assert coder.get_lib() is not None, "C++ coder failed to build"


@pytest.mark.parametrize("n", [1, 100, 10000, 300000])
def test_roundtrip(n):
    rng = np.random.default_rng(n)
    p = np.clip(rng.random(n), 1e-6, 1 - 1e-6).astype(np.float32)
    x = np.where(rng.random(n) < p, 1.0, -1.0).astype(np.float32)
    stream = coder.encode_pm1(x, p)
    out = coder.decode_pm1(stream, p)
    np.testing.assert_array_equal(out, x)


def test_rate_near_entropy():
    rng = np.random.default_rng(7)
    n = 200000
    p = np.full(n, 0.9, np.float32)
    x = np.where(rng.random(n) < 0.9, 1.0, -1.0)
    stream = coder.encode_pm1(x, p)
    bits = len(stream) * 8
    h = -(0.9 * np.log2(0.9) + 0.1 * np.log2(0.1))
    assert bits / n < h * 1.02 + 0.01, (bits / n, h)


def test_extreme_probs():
    n = 5000
    p = np.full(n, 1e-6, np.float32)
    x = -np.ones(n, np.float32)
    stream = coder.encode_pm1(x, p)
    # all symbols match the model (p(+1)=1e-6, all -1): the stream should be
    # nearly empty — just coder flush overhead
    assert len(stream) <= 16, len(stream)
    np.testing.assert_array_equal(coder.decode_pm1(stream, p), x)
    # a few surprising symbols
    x[::1000] = 1.0
    stream = coder.encode_pm1(x, p)
    np.testing.assert_array_equal(coder.decode_pm1(stream, p), x)


def test_python_cxx_bit_exact():
    rng = np.random.default_rng(11)
    n = 3000
    p = np.clip(rng.random(n), 1e-6, 1 - 1e-6).astype(np.float32)
    x = np.where(rng.random(n) < p, 1.0, -1.0)
    s_cpp = coder.encode_pm1(x, p)
    s_py = coder.encode_pm1(x, p, force_python=True)
    assert s_cpp == s_py
    np.testing.assert_array_equal(coder.decode_pm1(s_cpp, p, force_python=True), x)


def test_throughput():
    rng = np.random.default_rng(3)
    n = 2_000_000
    p = np.clip(rng.random(n), 0.01, 0.99).astype(np.float32)
    x = np.where(rng.random(n) < p, 1.0, -1.0)
    import time
    t0 = time.perf_counter()
    stream = coder.encode_pm1(x, p)
    enc_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = coder.decode_pm1(stream, p)
    dec_t = time.perf_counter() - t0
    np.testing.assert_array_equal(out, x)
    # native coder should be well over 1M sym/s; the loose bound keeps the
    # test meaningful (pure-Python is ~100x slower) without flaking when the
    # single host core is shared with a concurrent TPU/relay process
    assert enc_t < 8.0 and dec_t < 8.0, (enc_t, dec_t)
