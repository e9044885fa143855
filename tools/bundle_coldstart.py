#!/usr/bin/env python
"""Cold-start bundle validation + encode-chunk scaling probe (TPU).

In a FRESH process, rebuild the renderable field from a self-contained
bitstream directory (no training state in memory), verify the rendered
PSNR matches the recorded post-codec value, then re-encode the decoded
tables with a LARGER per-chunk vertex budget and re-decode, checking
losslessness and measuring the encode/decode wall-clock change (fewer,
larger chunk programs amortize the per-chunk dispatch/pull overhead).

Usage: python tools/bundle_coldstart.py [stream_dir] [chunk_vertices]
"""

import copy
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    stream_dir = sys.argv[1] if len(sys.argv) > 1 else "./bitstreams/chair"
    big_chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnc_tpu.codec import codec as codec_mod
    from cnc_tpu.config import CNCConfig
    from cnc_tpu.data.scenes import ProceduralDataset
    from cnc_tpu.models import context_models as cm
    from cnc_tpu.models import radiance_field as rf
    from cnc_tpu.render import renderer
    from cnc_tpu.utils import metrics as M

    with open(os.path.join(stream_dir, "meta.json")) as fh:
        meta = json.load(fh)
    cfg = CNCConfig.from_dict(meta["config"])

    t0 = time.time()
    entropy = cm.ContextModels(cfg.entropy, cfg.model.grid_3d,
                               cfg.model.grid_2d)
    log(f"context tables in {time.time() - t0:.1f}s")
    key = jax.random.PRNGKey(0)
    ent_template = entropy.init_params(key)
    mlp_template = rf.split_mlp_params(rf.init_radiance_field(key, cfg.model))
    pgs, ent_params, mlp_params, binaries = codec_mod.load_bundle(
        stream_dir, ent_template, mlp_template)
    binaries = jnp.asarray(binaries)

    codec = codec_mod.CNCCodec(entropy)
    t0 = time.time()
    rec = codec.decode(ent_params, binaries, pgs, stream_dir, prefix="b")
    dec_s = time.time() - t0
    log(f"cold decode in {dec_s:.1f}s")
    params = {**rec, **mlp_params}

    ds = ProceduralDataset("blocks", n_images=8, width=256, height=256,
                           split="test")
    rays, gt = ds.image_and_rays(0)
    aabb = jnp.asarray(cfg.render.aabb)
    rgb, _, _ = renderer.render_image(params, cfg.model, cfg.render, aabb,
                                      binaries, rays.origins, rays.viewdirs,
                                      jnp.ones((3,)))
    psnr = float(M.psnr(rgb, gt))
    log(f"cold-start PSNR (first test image): {psnr:.3f}")

    # --- re-encode the decoded tables with a larger chunk budget
    ent_big = copy.copy(entropy)
    ent_big.cfg = dataclasses.replace(cfg.entropy,
                                      max_points_per_chunk=big_chunk)
    codec_big = codec_mod.CNCCodec(ent_big)
    out_big = "/tmp/enc_bigchunk"
    tables = {k: rec[k] for k in ("xyz", "xy", "xz", "yz")}
    t0 = time.time()
    pgs2, est_mb, act_mb = codec_big.encode(ent_params, tables, binaries,
                                            out_big, prefix="b")
    enc_s = time.time() - t0
    log(f"encode @{big_chunk} vertices/chunk: {enc_s:.1f}s, "
        f"{act_mb:.4f} MB (analytic {est_mb:.4f})")

    t0 = time.time()
    rec2 = codec_big.decode(ent_params, binaries, pgs2, out_big, prefix="b")
    dec2_s = time.time() - t0
    same = all(bool(jnp.all(rec2[k] == rec[k]))
               for k in ("xyz", "xy", "xz", "yz"))
    log(f"decode @{big_chunk}: {dec2_s:.1f}s, lossless vs 2M decode: {same}")
    print(json.dumps({"cold_psnr": round(psnr, 3), "dec_s": round(dec_s, 1),
                      "big_chunk": big_chunk, "enc_big_s": round(enc_s, 1),
                      "dec_big_s": round(dec2_s, 1),
                      "act_MB": round(act_mb, 4), "lossless": same}))


if __name__ == "__main__":
    main()
