"""Full CNC pipeline: train -> eval -> encode -> decode -> re-eval -> quantize.

Orchestration mirror of the reference drivers (examples/
train_CNC_nerf_synthetic.py:302-613): joint RD training, test-set evaluation,
full-coverage encoding to bitstreams, zeroing the tables and decoding them
back (the built-in lossless self-check), post-codec evaluation, 13-bit MLP
quantization with final evaluation, and one append-only TSV result row with
the reference's column order (:562-613, SSIM recorded negated like :420).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CNCConfig
from ..codec import codec as codec_mod
from ..grids import occupancy as occ
from ..models import context_models as cm
from ..models import radiance_field as rf
from ..utils import metrics as M
from .trainer import Trainer


@dataclasses.dataclass
class PipelineResult:
    psnr: float
    lpips: Optional[float]    # None = no LPIPS weights (recorded "n/a")
    ssim: float
    psnr_codec: float
    lpips_codec: Optional[float]
    ssim_codec: float
    embed_MB_est: float
    embed_MB_codec: float
    mlp_MB_orig: float
    context_MB: float
    binary_vxl_MB: float
    quant_results: list
    elapsed_train_s: float
    encode_s: float
    decode_s: float
    raw_table_MB: float = float("nan")   # fp32 size of the four hash tables

    def total_size_MB(self, digit_idx: int = 0) -> float:
        return (self.embed_MB_codec + self.context_MB + self.binary_vxl_MB +
                self.quant_results[digit_idx]["mlp_MB"])

    def compression_x(self, digit_idx: int = 0) -> float:
        """Coded-bundle compression vs the raw fp32 tables + fp32 MLPs —
        the in-framework analogue of the reference's ~100x-vs-Instant-NGP
        headline (README.md:3; INGP ~50 MB anchor, BASELINE.md)."""
        return ((self.raw_table_MB + self.mlp_MB_orig) /
                self.total_size_MB(digit_idx))


def build_entropy(cfg: CNCConfig, n_devices: int = 1) -> cm.ContextModels:
    """Entropy model; with n_devices > 1, per-device sampling quotas so a
    data-parallel Trainer spreads the total budget across the mesh (each
    device rates different windows; bits are pmean'd)."""
    ecfg = cfg.entropy
    if n_devices > 1:
        ecfg = dataclasses.replace(
            ecfg,
            sample_num=max(1, ecfg.sample_num // n_devices),
            v_ctx_cap=max(256, ecfg.v_ctx_cap // n_devices),
            sample_num_2d=(max(64, ecfg.sample_num_2d // n_devices)
                           if ecfg.sample_num_2d else ecfg.sample_num_2d),
            pn_frac_sample_cap=(max(1024,
                                    ecfg.pn_frac_sample_cap // n_devices)
                                if ecfg.pn_frac_sample_cap
                                else ecfg.pn_frac_sample_cap))
    return cm.ContextModels(ecfg, cfg.model.grid_3d, cfg.model.grid_2d)


def run_pipeline(cfg: CNCConfig, train_dataset, test_dataset, scene: str,
                 out_root: str = ".", max_steps: Optional[int] = None,
                 max_eval_images: Optional[int] = None,
                 mesh=None, log_fn=print) -> PipelineResult:
    t0 = time.time()
    n_dev = int(mesh.shape["data"]) if mesh is not None else 1
    entropy = (build_entropy(cfg, n_dev) if cfg.train.lmbda > 0 else None)
    log_fn(f"entropy tables built in {time.time() - t0:.1f}s")
    trainer = Trainer(cfg, train_dataset, entropy=entropy, mesh=mesh)
    trainer.warm_compile(log_fn=log_fn)   # concurrent compiles (wall ~ max)
    return run_with_trainer(trainer, test_dataset, scene, out_root=out_root,
                            max_steps=max_steps,
                            max_eval_images=max_eval_images, log_fn=log_fn)


def run_with_trainer(trainer: Trainer, test_dataset, scene: str,
                     out_root: str = ".", max_steps: Optional[int] = None,
                     max_eval_images: Optional[int] = None,
                     log_fn=print, log_every: int = 200) -> PipelineResult:
    """Pipeline body over a prebuilt (possibly reset_state-ed) Trainer.

    Split out of run_pipeline so an in-process RD sweep can reuse one
    Trainer's compiled programs and entropy tables across λ points — the
    tunneled TPU backend cannot serialize executables, so fresh-process
    points would each repay the ~5-10 min table-build + compile fixed cost
    (tools/rd_sweep_depth.py)."""
    cfg = trainer.cfg
    entropy = trainer.entropy
    log_fn("training...")
    elapsed = trainer.fit(max_steps=max_steps, log_fn=log_fn,
                          log_every=log_every)

    log_fn("evaluating (pre-codec)...")
    ev = trainer.evaluate(test_dataset, max_images=max_eval_images,
                          log_fn=log_fn)

    embed_mb_est = embed_mb_codec = 0.0
    enc_s = dec_s = 0.0
    context_mb = 0.0
    stream_dir = os.path.join(out_root, "bitstreams", scene)
    if cfg.train.lmbda > 0:
        codec = codec_mod.CNCCodec(entropy)
        tables = rf.quantized_tables(trainer.params, cfg.model)
        t0 = time.time()
        # one occupancy-cache build serves both codec passes (the decode
        # self-check runs on the same binaries immediately after)
        codec_cache = entropy.refresh_cache_int(trainer.occ_state.binaries)
        pgs, embed_mb_est, embed_mb_codec = codec.encode(
            trainer.ent_params, tables, trainer.occ_state.binaries, stream_dir,
            prefix="b", cache=codec_cache)
        enc_s = time.time() - t0
        log_fn(f"encoded {embed_mb_codec:.4f} MB "
               f"(analytic {embed_mb_est:.4f} MB) in {enc_s:.1f}s "
               f"-> {stream_dir}")

        # lossless self-check: zero the tables, decode, swap in (driver
        # :446-471)
        zeroed = {k: jnp.zeros_like(trainer.params[k])
                  for k in ("xyz", "xy", "xz", "yz")}
        trainer.params = rf.replace_tables(trainer.params, zeroed)
        t0 = time.time()
        rec = codec.decode(trainer.ent_params, trainer.occ_state.binaries,
                           pgs, stream_dir, prefix="b", cache=codec_cache)
        dec_s = time.time() - t0
        trainer.params = rf.replace_tables(trainer.params, rec)
        log_fn(f"decoded in {dec_s:.1f}s")
        context_mb = entropy.param_count(trainer.ent_params) * 4 / 1024 / 1024
        codec_mod.save_bundle(
            stream_dir, pgs, trainer.ent_params,
            rf.split_mlp_params(trainer.params), trainer.occ_state.binaries,
            {"scene": scene, "lmbda": cfg.train.lmbda,
             "n_features": cfg.model.n_features_per_level,
             "config": cfg.to_dict()})

    log_fn("evaluating (post-codec)...")
    ev_codec = trainer.evaluate(test_dataset,
                                max_images=max_eval_images, log_fn=log_fn)

    # 13-bit MLP quantization sweep (driver :508-556)
    quant_results = []
    mlp_params = rf.split_mlp_params(trainer.params)
    _, mlp_mb_orig, _ = codec_mod.quantize_mlp_params(mlp_params, 13)
    for digits in cfg.train.mlp_quant_digits:
        mb, _, q = codec_mod.quantize_mlp_params(mlp_params, digits)
        trainer.params = {**trainer.params, **q}
        ev_q = trainer.evaluate(test_dataset, max_images=max_eval_images,
                                log_fn=log_fn)
        quant_results.append({"digits": digits, "mlp_MB": mb, **ev_q})

    _, vxl_bits, _ = occ.occupancy_grid_size_bits(trainer.occ_state.binaries)
    vxl_mb = float(vxl_bits) / 8 / 1024 / 1024

    result = PipelineResult(
        psnr=ev["psnr"], lpips=ev["lpips"], ssim=ev["ssim"],
        psnr_codec=ev_codec["psnr"], lpips_codec=ev_codec["lpips"],
        ssim_codec=ev_codec["ssim"],
        embed_MB_est=embed_mb_est, embed_MB_codec=embed_mb_codec,
        mlp_MB_orig=mlp_mb_orig, context_MB=context_mb,
        binary_vxl_MB=vxl_mb, quant_results=quant_results,
        elapsed_train_s=elapsed, encode_s=enc_s, decode_s=dec_s,
        raw_table_MB=sum(int(np.prod(trainer.params[k].shape))
                         for k in ("xyz", "xy", "xz", "yz")) * 4 / 1024**2)
    log_fn(f"compression: {result.raw_table_MB:.1f} MB raw fp32 tables -> "
           f"{result.total_size_MB():.4f} MB bundle "
           f"({result.compression_x():.1f}x)")
    return result


def decode_bundle(stream_dir: str, log_fn=print):
    """Rebuild a renderable radiance field from a self-contained bitstream
    directory in a FRESH process: config from meta.json, context/MLP weights
    and occupancy from meta.npz, hash tables decoded from the streams.

    The reference cannot do this — it decodes in the training process with
    Pg scalars and model weights still in memory (utils_bpp_acc.py:865,
    driver :434-464); the self-contained bundle is this framework's claimed
    extension.  Returns (params, binaries, cfg) ready for render_image."""
    import json as _json

    import jax as _jax
    import jax.numpy as _jnp

    with open(os.path.join(stream_dir, "meta.json")) as fh:
        meta = _json.load(fh)
    cfg = CNCConfig.from_dict(meta["config"])
    entropy = cm.ContextModels(cfg.entropy, cfg.model.grid_3d,
                               cfg.model.grid_2d)
    key = _jax.random.PRNGKey(0)
    ent_template = entropy.init_params(key)
    mlp_template = rf.split_mlp_params(rf.init_radiance_field(key, cfg.model))
    pgs, ent_params, mlp_params, binaries = codec_mod.load_bundle(
        stream_dir, ent_template, mlp_template)
    binaries = _jnp.asarray(binaries)
    codec = codec_mod.CNCCodec(entropy)
    t0 = time.time()
    rec = codec.decode(ent_params, binaries, pgs, stream_dir, prefix="b")
    log_fn(f"decoded bundle {stream_dir} in {time.time() - t0:.1f}s")
    params = {**rec, **mlp_params}
    return params, binaries, cfg


def append_result_row(result: PipelineResult, scene: str, dataset_name: str,
                      out_root: str = "."):
    """Append the TSV row with the reference's column layout (driver
    :562-613).  SSIM is written negated, as the reference records it."""
    outdir = os.path.join(out_root, "results", dataset_name)
    os.makedirs(outdir, exist_ok=True)
    r = result

    def fmt(v):
        # absent LPIPS (no weights) is recorded "n/a", never NaN
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "n/a"
        return np.round(v, 4)

    cols = [scene,
            fmt(r.psnr), fmt(r.lpips), fmt(-r.ssim),
            fmt(r.psnr_codec), fmt(r.lpips_codec), fmt(-r.ssim_codec),
            fmt(r.embed_MB_est), fmt(r.embed_MB_codec),
            fmt(r.mlp_MB_orig), fmt(r.context_MB), fmt(r.binary_vxl_MB)]
    for i, q in enumerate(r.quant_results):
        cols += [q["digits"], fmt(q["mlp_MB"]),
                 fmt(q["psnr"]), fmt(q["lpips"]), fmt(-q["ssim"]),
                 fmt(r.total_size_MB(i))]
    cols += [np.round(r.elapsed_train_s, 4), np.round(r.encode_s, 4),
             np.round(r.decode_s, 4),
             # extension columns (not in the reference layout): raw fp32
             # table MB and the resulting compression factor
             fmt(r.raw_table_MB), fmt(r.compression_x())]
    with open(os.path.join(outdir, "output.txt"), "a") as fw:
        fw.write("\t".join(str(c) for c in cols) + "\n")
