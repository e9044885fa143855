"""Host-side binary range coder (torchac replacement).

Loads the C++ coder (native/range_coder.cpp) through ctypes, building it with
g++ on first use; a bit-exact pure-Python mirror serves as fallback and as a
cross-check in tests.  Probabilities are quantized once in numpy
(`quantize_probs`) and must be byte-identical between encode and decode.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import tempfile
from typing import Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[1] / "native"
_SO_PATH = _NATIVE_DIR / "librange_coder.so"
_LIB: Optional[ctypes.CDLL] = None
_TOP = 1 << 24


def _build_native() -> Optional[ctypes.CDLL]:
    src = _NATIVE_DIR / "range_coder.cpp"
    if not src.exists():
        return None
    try:
        if (not _SO_PATH.exists() or
                _SO_PATH.stat().st_mtime < src.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(src), "-o", str(_SO_PATH)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.rc_encode_bits.restype = ctypes.c_int64
        lib.rc_encode_bits.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        lib.rc_decode_bits.restype = ctypes.c_int64
        lib.rc_decode_bits.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p]
        return lib
    except Exception:
        return None


def get_lib(force_python: bool = False) -> Optional[ctypes.CDLL]:
    global _LIB
    if force_python:
        return None
    if _LIB is None:
        _LIB = _build_native()
    return _LIB


def quantize_probs(p: np.ndarray) -> np.ndarray:
    """float P(+1) -> uint16 in [1, 65535]; shared by both codec sides."""
    p = np.asarray(p, np.float64)
    q = np.rint(p * 65536.0)
    return np.clip(q, 1, 65535).astype(np.uint16)


def encode_bits(bits: np.ndarray, probs_q: np.ndarray,
                force_python: bool = False) -> bytes:
    """Encode bits (0/1) with quantized P(1)=probs_q/65536."""
    bits = np.ascontiguousarray(np.asarray(bits, np.uint8))
    probs_q = np.ascontiguousarray(probs_q, dtype=np.uint16)
    n = bits.size
    assert probs_q.size == n
    lib = get_lib(force_python)
    if lib is not None:
        cap = 2 * n + 64
        out = np.empty(cap, np.uint8)
        written = lib.rc_encode_bits(
            bits.ctypes.data, probs_q.ctypes.data, n, out.ctypes.data, cap)
        if written < 0:
            raise RuntimeError("range coder output overflow")
        return out[:written].tobytes()
    return _py_encode(bits, probs_q)


def decode_bits(stream: bytes, probs_q: np.ndarray,
                force_python: bool = False) -> np.ndarray:
    probs_q = np.ascontiguousarray(probs_q, dtype=np.uint16)
    n = probs_q.size
    lib = get_lib(force_python)
    if lib is not None:
        buf = np.frombuffer(stream, np.uint8)
        out = np.empty(n, np.uint8)
        lib.rc_decode_bits(buf.ctypes.data, buf.size, probs_q.ctypes.data, n,
                           out.ctypes.data)
        return out
    return _py_decode(stream, probs_q)


# ---------------------------------------------------------------- python mirror
def _py_encode(bits: np.ndarray, probs_q: np.ndarray) -> bytes:
    out = bytearray()
    low = 0
    rng = 0xFFFFFFFF
    cache = 0
    cache_size = 1

    def shift_low():
        nonlocal low, cache, cache_size
        if (low >> 32) != 0 or (low & 0xFFFFFFFF) < 0xFF000000:
            carry = low >> 32
            while cache_size:
                out.append((cache + carry) & 0xFF)
                cache = 0xFF
                cache_size -= 1
            cache = (low >> 24) & 0xFF
            cache_size = 0
        cache_size += 1
        low = (low << 8) & 0xFFFFFFFF

    for b, pq in zip(bits, probs_q):
        r1 = (rng * int(pq)) >> 16
        r1 = min(max(r1, 1), rng - 1)
        if b:
            rng = r1
        else:
            low += r1
            rng -= r1
        while rng < _TOP:
            shift_low()
            rng = (rng << 8) & 0xFFFFFFFF
    for _ in range(5):
        shift_low()
    return bytes(out)


def _py_decode(stream: bytes, probs_q: np.ndarray) -> np.ndarray:
    data = stream + b"\x00" * 8
    pos = 1  # skip encoder's initial cache byte
    code = int.from_bytes(data[1:5], "big")
    pos = 5
    rng = 0xFFFFFFFF
    n = probs_q.size
    bits = np.empty(n, np.uint8)
    for i in range(n):
        r1 = (rng * int(probs_q[i])) >> 16
        r1 = min(max(r1, 1), rng - 1)
        if code < r1:
            bits[i] = 1
            rng = r1
        else:
            bits[i] = 0
            code -= r1
            rng -= r1
        while rng < _TOP:
            code = ((code << 8) | data[pos]) & 0xFFFFFFFF
            pos += 1
            rng = (rng << 8) & 0xFFFFFFFF
    return bits


def encode_pm1(values: np.ndarray, p: np.ndarray, **kw) -> bytes:
    """Encode +-1 symbols with P(+1)=p (the CNC convention,
    utils_bpp_acc.py:86: sym=(x+1)/2)."""
    bits = (np.asarray(values).reshape(-1) > 0).astype(np.uint8)
    return encode_bits(bits, quantize_probs(np.asarray(p).reshape(-1)), **kw)


def decode_pm1(stream: bytes, p: np.ndarray, **kw) -> np.ndarray:
    bits = decode_bits(stream, quantize_probs(np.asarray(p).reshape(-1)), **kw)
    return bits.astype(np.float32) * 2.0 - 1.0
