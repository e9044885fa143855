"""Training and evaluation renderers.

Mirrors the reference's two paths:
  * training: single-pass budgeted render (render_image_with_occgrid,
    examples/utils.py:83-216) — march, compact to a static sample budget,
    evaluate the field once, composite;
  * evaluation: iterative alive-ray renderer (render_image_with_occgrid_test,
    utils.py:316-489) — repeatedly march from per-ray cursors with a bounded
    per-round sample budget, composite incrementally with carried
    transmittance (prefix_trans = 1 - opacity), stop rays at opacity >
    1 - early_stop_eps, all inside one jitted lax.while_loop.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, RenderConfig
from ..models import radiance_field as rf
from . import marching, volrend


def render_rays_train(params: Dict, mcfg: ModelConfig, rcfg: RenderConfig,
                      aabb: jnp.ndarray, binaries: jnp.ndarray,
                      rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                      key: jnp.ndarray, render_bkgd: jnp.ndarray,
                      capacity: Optional[int] = None,
                      tables: Optional[Dict] = None,
                      visible_capacity: Optional[int] = None
                      ) -> volrend.RenderedRays:
    """One training render pass over a ray batch.

    With rcfg.visible_frac set (or an explicit visible_capacity), a
    gradient-free density prefilter prunes invisible samples before the
    differentiable field eval — the reference's structure exactly:
    estimator.sampling runs under @torch.no_grad and drops samples whose
    transmittance fell below early_stop_eps (occ_grid.py:88-239,
    volrend.py:424-482), then `rendering` re-evaluates the field on the
    survivors only.  Invisible samples carry zero rendering weight and no
    gradient path, so pruning leaves the gradients bit-identical; the one
    divergence — a pruned-buffer overflow — is surfaced via resume_ray so
    the trainer can mask the affected rays out of the loss.
    """
    n_rays = rays_o.shape[0]
    cap = capacity or rcfg.sample_capacity
    if visible_capacity is None and rcfg.visible_frac is not None:
        visible_capacity = max(8, int(cap * rcfg.visible_frac)) // 8 * 8
    samples = marching.march_rays(rays_o, rays_d, binaries, aabb, key, rcfg, cap)
    pos, dirs = marching.sample_positions(samples, rays_o, rays_d)
    if tables is None:
        tables = rf.quantized_tables(params, mcfg)
    resume_ray = None
    n_visible = None
    if visible_capacity is not None and visible_capacity < cap:
        from ..ops import scatter_ops

        sig_pre = jax.lax.stop_gradient(
            rf.query_density(params, mcfg, aabb, pos, tables=tables))
        _, _, vis = volrend.render_weights(sig_pre, samples,
                                           rcfg.early_stop_eps,
                                           alpha_thre=rcfg.alpha_thre)
        n_visible = jnp.sum(vis)
        src, total = scatter_ops.compact_mask_indices(vis, visible_capacity)
        valid2 = (jnp.arange(visible_capacity)
                  < jnp.minimum(total, visible_capacity))
        ray_id2 = jnp.where(valid2, samples.ray_id[src], n_rays - 1)
        # overflow: the ray owning the last kept slot may have lost samples,
        # and every later ray certainly did; march truncation composes in
        resume_ray = jnp.where(total > visible_capacity,
                               ray_id2[visible_capacity - 1],
                               jnp.int32(n_rays))
        if samples.resume_ray is not None:
            resume_ray = jnp.minimum(resume_ray, samples.resume_ray)
        samples = marching.RaySamples(
            ray_id=ray_id2, t_mid=samples.t_mid[src], dt=samples.dt,
            valid=valid2, num_samples=samples.num_samples)
        pos, dirs = marching.sample_positions(samples, rays_o, rays_d)
    rgbs, sigmas = rf.forward(params, mcfg, aabb, pos, dirs, tables=tables)
    out = volrend.composite(rgbs, sigmas, samples, n_rays,
                            render_bkgd, rcfg.early_stop_eps,
                            alpha_thre=rcfg.alpha_thre)
    if n_visible is not None:
        # report the prefilter's TRUE visible count (the pruned buffer's own
        # count saturates at its capacity) and the overflow resume point
        out = out._replace(n_rendering_samples=n_visible,
                           resume_ray=resume_ray)
    return out


def render_rays_eval(params: Dict, mcfg: ModelConfig, rcfg: RenderConfig,
                     aabb: jnp.ndarray, binaries: jnp.ndarray,
                     rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     render_bkgd: jnp.ndarray,
                     round_capacity: Optional[int] = None,
                     max_rounds: Optional[int] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Iterative exact eval renderer for one ray chunk.

    The per-round budget mirrors the reference test renderer's
    alive-rays x samples-per-iter sizing (utils.py:395-479): R rays x
    rcfg.eval_samples_per_iter samples, up to rcfg.eval_max_iters rounds.
    Returns (rgb [R,3], opacity [R,1], depth [R,1]).
    """
    r = rays_o.shape[0]
    if round_capacity is None:
        round_capacity = r * rcfg.eval_samples_per_iter
    if max_rounds is None:
        max_rounds = rcfg.eval_max_iters
    tables = rf.quantized_tables(params, mcfg)
    opc_thre = 1.0 - rcfg.early_stop_eps
    # hoisted out of the while_loop body (loop-invariant)
    mip = marching.build_march_mip(binaries)

    def cond(state):
        i, rgb, opacity, depth, cursor, alive = state
        return (i < max_rounds) & jnp.any(alive)

    def body(state):
        i, rgb, opacity, depth, cursor, alive = state
        samples = marching.march_rays(rays_o, rays_d, binaries, aabb, None,
                                      rcfg, round_capacity, ray_mask=alive,
                                      t_start=cursor, mip=mip)
        pos, dirs = marching.sample_positions(samples, rays_o, rays_d)
        rgbs, sigmas = rf.forward(params, mcfg, aabb, pos, dirs, tables=tables)
        out = volrend.composite(rgbs, sigmas, samples, r,
                                render_bkgd=None,
                                early_stop_eps=rcfg.early_stop_eps,
                                prefix_trans=1.0 - opacity[:, 0],
                                alpha_thre=rcfg.alpha_thre)
        rgb = rgb + out.rgb
        opacity = opacity + out.opacity
        depth = depth + out.depth

        # advance cursors: rays whose hits all fit are done this round;
        # truncated rays resume after their last compacted sample
        hits_per_ray = jax.ops.segment_sum(
            samples.valid.astype(jnp.int32), samples.ray_id, num_segments=r,
            indices_are_sorted=True)
        last_t = jax.ops.segment_max(
            jnp.where(samples.valid, samples.t_mid, -jnp.inf),
            samples.ray_id, num_segments=r, indices_are_sorted=True)
        # compaction keeps hits in (ray, t) order, so only rays strictly
        # before the marcher's first possibly-incomplete ray are complete;
        # that ray resumes at its advanced cursor, later rays are untouched
        ray_done = jnp.arange(r) < samples.resume_ray
        new_cursor = jnp.where(
            hits_per_ray > 0, jnp.maximum(cursor, last_t + samples.dt * 0.5),
            cursor)
        alive = alive & ~ray_done & (opacity[:, 0] <= opc_thre)
        return i + 1, rgb, opacity, depth, new_cursor, alive

    state0 = (jnp.int32(0), jnp.zeros((r, 3)), jnp.zeros((r, 1)),
              jnp.zeros((r, 1)), jnp.full((r,), rcfg.near_plane),
              jnp.ones((r,), bool))
    _, rgb, opacity, depth, _, _ = jax.lax.while_loop(cond, body, state0)
    rgb = rgb + render_bkgd * (1.0 - opacity)
    depth = depth / jnp.clip(opacity, min=1e-10)
    return rgb, opacity, depth


def render_image(params: Dict, mcfg: ModelConfig, rcfg: RenderConfig,
                 aabb, binaries, rays_o, rays_d, render_bkgd,
                 chunk: Optional[int] = None,
                 progress_fn=None, progress_every: int = 8,
                 _jitted_cache={}):
    """Host-side loop rendering a full image in chunks via render_rays_eval.

    progress_fn(done_chunks, total_chunks), when given, is called every
    `progress_every` chunks AFTER forcing the latest chunk to finish on
    device (a host-pulled reduction — through the axon relay
    block_until_ready does not synchronize, see .claude/skills/verify).
    Without it a full-image eval is one silent async dispatch burst that a
    log-staleness watchdog cannot distinguish from a relay hang."""
    h, w = rays_o.shape[:2]
    n = h * w
    chunk = chunk or rcfg.eval_chunk_rays
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    pad = (-n) % chunk
    if pad:
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (pad, 3))])
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (pad, 3))])
    # key on the frozen dataclasses themselves — an id() can be recycled
    # after GC and silently return a jit for a different config
    fn = _jitted_cache.get((mcfg, rcfg, chunk))
    if fn is None:
        fn = jax.jit(functools.partial(render_rays_eval, mcfg=mcfg, rcfg=rcfg))
        _jitted_cache[(mcfg, rcfg, chunk)] = fn
    outs = []
    total_chunks = (o.shape[0] + chunk - 1) // chunk
    for i in range(0, o.shape[0], chunk):
        outs.append(fn(params, aabb=aabb, binaries=binaries,
                       rays_o=o[i:i + chunk], rays_d=d[i:i + chunk],
                       render_bkgd=render_bkgd))
        done = len(outs)
        if progress_fn is not None and (done % progress_every == 0
                                        or done == total_chunks):
            float(jnp.sum(outs[-1][0]))   # host-pulled sync (relay-safe)
            progress_fn(done, total_chunks)
    rgb = jnp.concatenate([x[0] for x in outs])[:n].reshape(h, w, 3)
    opacity = jnp.concatenate([x[1] for x in outs])[:n].reshape(h, w, 1)
    depth = jnp.concatenate([x[2] for x in outs])[:n].reshape(h, w, 1)
    return rgb, opacity, depth
