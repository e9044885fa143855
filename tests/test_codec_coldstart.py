"""Cross-process codec guarantees (VERDICT r2 #1).

The round-2 cold-start probe found a 1.05 dB PSNR loss when a bundle encoded
in one process was decoded in a fresh one: float-level differences between
compiled probability pipelines desynced the range coder.  The codec now
computes every probability through the integer pipeline (codec/intctx.py),
which is deterministic by construction — these tests enforce the resulting
contracts across real process boundaries:

  * decode in a FRESH python process reproduces the encoder's tables
    bit-exactly (the reference cannot do this at all: it reuses one
    process's in-memory probabilities, utils_bpp_acc.py:81-110);
  * encoding the same tables in two separate processes yields byte-identical
    streams (bitstreams are a pure function of (tables, occupancy, params)).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from cnc_tpu.codec import codec as codec_mod
from cnc_tpu.models import context_models as cm
from cnc_tpu.ops import ste as ste_ops

from test_context_models import tiny_setup

# Rebuilds the identical fixture (same seeds) in a fresh interpreter, then
# encodes or decodes.  Environment mirrors conftest.py's CPU forcing.
_WORKER = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from cnc_tpu.codec import codec as codec_mod
from cnc_tpu.models import context_models as cm
from cnc_tpu.ops import ste as ste_ops
from test_context_models import tiny_setup

ecfg, spec3, spec2 = tiny_setup()
ctx = cm.ContextModels(ecfg, spec3, spec2)
rng = np.random.default_rng(42)
ent_params = ctx.init_params(jax.random.PRNGKey(1))
tables = {{}}
for name, spec in (("xyz", spec3), ("xy", spec2), ("xz", spec2),
                   ("yz", spec2)):
    raw = rng.standard_normal((spec.total_entries, 2)).astype(np.float32)
    raw += 0.5
    tables[name] = ste_ops.ste_binary(jnp.asarray(raw))
binaries = jnp.asarray(rng.random((16, 16, 16)) < 0.2)
cd = codec_mod.CNCCodec(ctx)
mode, stream_dir, out_npz = sys.argv[1], sys.argv[2], sys.argv[3]
if mode == "encode":
    pgs, _, _ = cd.encode(ent_params, tables, binaries, stream_dir)
    np.savez(out_npz, pgs_keys=np.asarray(list(pgs)),
             pgs_vals=np.asarray([pgs[k] for k in pgs], np.float32),
             **{{k: np.asarray(v) for k, v in tables.items()}})
else:
    d = np.load(out_npz)
    pgs = {{str(k): float(v) for k, v in zip(d["pgs_keys"], d["pgs_vals"])}}
    rec = cd.decode(ent_params, binaries, pgs, stream_dir)
    np.savez(out_npz.replace(".npz", "_rec.npz"),
             **{{k: np.asarray(v) for k, v in rec.items()}})
print("WORKER_OK")
"""


def _run_worker(mode, stream_dir, npz):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _WORKER.format(repo=repo, tests=os.path.join(repo, "tests"))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    r = subprocess.run([sys.executable, "-c", code, mode, stream_dir, npz],
                       capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0 and "WORKER_OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-4000:])


@pytest.fixture(scope="module")
def encoded(tmp_path_factory):
    """Encode once in THIS process (mirrors test_codec's fixture seeds)."""
    ecfg, spec3, spec2 = tiny_setup()
    ctx = cm.ContextModels(ecfg, spec3, spec2)
    rng = np.random.default_rng(42)
    ent_params = ctx.init_params(jax.random.PRNGKey(1))
    tables = {}
    for name, spec in (("xyz", spec3), ("xy", spec2), ("xz", spec2),
                       ("yz", spec2)):
        raw = rng.standard_normal((spec.total_entries, 2)).astype(np.float32)
        raw += 0.5
        tables[name] = ste_ops.ste_binary(jnp.asarray(raw))
    binaries = jnp.asarray(rng.random((16, 16, 16)) < 0.2)
    out = str(tmp_path_factory.mktemp("cold_streams"))
    cd = codec_mod.CNCCodec(ctx)
    pgs, _, _ = cd.encode(ent_params, tables, binaries, out)
    npz = os.path.join(out, "state.npz")
    np.savez(npz, pgs_keys=np.asarray(list(pgs)),
             pgs_vals=np.asarray([pgs[k] for k in pgs], np.float32),
             **{k: np.asarray(v) for k, v in tables.items()})
    return ctx, tables, out, npz


def test_fresh_process_decode_bit_exact(encoded):
    """A fresh interpreter decodes the streams bit-exactly (covered entries
    match the encoder's tables; untouched entries stay +1)."""
    ctx, tables, stream_dir, npz = encoded
    _run_worker("decode", stream_dir, npz)
    rec = np.load(npz.replace(".npz", "_rec.npz"))
    # any desync would have tripped the sha256 check in decode (the worker
    # would have raised); additionally compare the decoded tables against
    # the encoder's, modulo the +1 initialization of uncovered entries.
    for name in ("xyz", "xy", "xz", "yz"):
        got = rec[name]
        want = np.asarray(tables[name])
        diff = got != want
        # entries that differ must all be the +1 initialization (uncovered)
        assert np.all(got[np.any(diff, axis=-1)] == 1.0), name


def test_cross_process_encode_identical_streams(encoded, tmp_path):
    """Two independent interpreters produce byte-identical bitstreams."""
    _, _, stream_dir, npz = encoded
    d2 = str(tmp_path / "enc2")
    os.makedirs(d2)
    _run_worker("encode", d2, os.path.join(d2, "state.npz"))
    names = sorted(f for f in os.listdir(stream_dir) if f.endswith(".b"))
    names2 = sorted(f for f in os.listdir(d2) if f.endswith(".b"))
    assert names == names2
    for n in names:
        with open(os.path.join(stream_dir, n), "rb") as a, \
                open(os.path.join(d2, n), "rb") as b:
            assert a.read() == b.read(), f"stream {n} differs across processes"
    with open(os.path.join(stream_dir, "b_checks.json")) as a, \
            open(os.path.join(d2, "b_checks.json")) as b:
        assert json.load(a) == json.load(b)
