#!/usr/bin/env python
"""CNC-TPU driver for Tanks&Temples (NSVF layout) scenes.

CLI mirror of the reference examples/train_CNC_tank_temples.py — the only
differences from the synthetic driver are the dataset class, the per-scene
aabb/step size read from bbox.txt, and the results directory (SURVEY.md §3.1).
"""

import argparse
import dataclasses
import os
import pathlib

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str,
                        default=str(pathlib.Path.cwd() / "data/TanksAndTemple"))
    parser.add_argument("--train_split", type=str, default="train",
                        choices=["train", "trainval"])
    parser.add_argument("--scene", type=str, default="Barn")
    parser.add_argument("--lmbda", type=float, default=2e-3)
    parser.add_argument("--Pg_level", type=int, default=12)
    parser.add_argument("--Pg_level_2D", type=int, default=4)
    parser.add_argument("--log2_hashmap_size", type=int, default=19)
    parser.add_argument("--log2_hashmap_size_2D", type=int, default=17)
    parser.add_argument("--sample_num", type=int, default=200000)
    parser.add_argument("--max_context_layer_num", type=int, default=3)
    parser.add_argument("--n_features", type=int, default=4)
    parser.add_argument("--max_steps", type=int, default=20000)
    parser.add_argument("--max_eval_images", type=int, default=None)
    parser.add_argument("--out_root", type=str, default=".")
    parser.add_argument("--multichip", action="store_true",
                        help="data-parallel training over all local devices")
    parser.add_argument("--visible_frac", type=float, default=None,
                        help="prune invisible samples before the "
                             "differentiable field eval, compacting to this "
                             "fraction of the sample buffer (the reference's "
                             "no-grad sampling prefilter, occ_grid.py:88); "
                             "None = evaluate every marched sample")
    parser.add_argument("--rate_update_interval", type=int, default=1,
                        help="run the entropy rate gradients every K steps "
                             "(1 = reference schedule)")
    parser.add_argument("--checkpoint_path", type=str, default=None,
                        help="enable checkpoint/auto-resume at this path")
    parser.add_argument("--checkpoint_every", type=int, default=1000)
    parser.add_argument("--ctx_grad", type=int, default=1,
                        help="0: stop-gradient the coarser-level context "
                             "lookups in the rate estimate (skips their "
                             "scatter-heavy backward; see EntropyConfig)")
    parser.add_argument("--eval_spi", type=int, default=None,
                        help="eval per-round sample budget "
                             "(RenderConfig.eval_samples_per_iter); the "
                             "overnight orchestrator passes the value "
                             "tools/eval_profile.py measured fastest")
    parser.add_argument("--decode_only", action="store_true",
                        help="rebuild the field from bitstreams/<scene>/ in "
                             "a fresh process, render the test set, report "
                             "PSNR (no training)")
    args = parser.parse_args()

    from cnc_tpu.utils.jit_cache import ensure_compilation_cache
    ensure_compilation_cache()
    from cnc_tpu.config import (CNCConfig, EntropyConfig, ModelConfig,
                                RenderConfig, TrainConfig)
    from cnc_tpu.data import tanks
    from cnc_tpu.train import driver

    scene_dir = os.path.join(args.data_root, args.scene)
    if os.path.isdir(scene_dir):
        aabb, step = tanks.load_scene_bbox(args.data_root, args.scene)
        train_ds = tanks.SubjectLoaderTanks(args.scene, args.data_root,
                                            args.train_split, num_rays=1024)
        test_ds = tanks.SubjectLoaderTanks(args.scene, args.data_root, "test")
        render = RenderConfig(visible_frac=args.visible_frac,
                              aabb=tuple(float(x) for x in aabb),
                              near_plane=train_ds.NEAR,
                              render_step_size=step)
        dataset_name = "TanksAndTemple"
    else:
        print(f"[cnc_tpu] dataset not found at {scene_dir}; using a "
              f"procedural scene through the same pipeline")
        from cnc_tpu.data.scenes import ProceduralDataset
        train_ds = ProceduralDataset("blocks", n_images=24, width=256,
                                     height=256, split="train")
        test_ds = ProceduralDataset("blocks", n_images=8, width=256,
                                    height=256, split="test")
        render = RenderConfig(visible_frac=args.visible_frac)
        dataset_name = "Procedural"
    if args.eval_spi:
        render = dataclasses.replace(render,
                                     eval_samples_per_iter=args.eval_spi)

    cfg = CNCConfig(
        model=ModelConfig(
            n_features_per_level=args.n_features,
            log2_hashmap_size=args.log2_hashmap_size,
            log2_hashmap_size_2D=args.log2_hashmap_size_2D),
        entropy=EntropyConfig(
            n_features=args.n_features, sample_num=args.sample_num,
            max_context_layer_num=args.max_context_layer_num,
            Pg_level=args.Pg_level, Pg_level_2D=args.Pg_level_2D,
            ctx_grad=bool(args.ctx_grad)),
        render=render,
        train=dataclasses.replace(TrainConfig(), lmbda=args.lmbda,
                                  max_steps=args.max_steps,
                                  rate_update_interval=args.rate_update_interval,
                                  checkpoint_path=args.checkpoint_path,
                                  checkpoint_every=args.checkpoint_every),
    )
    if args.decode_only:
        import jax.numpy as jnp
        import numpy as np
        from cnc_tpu.render import renderer
        from cnc_tpu.utils import metrics as M

        stream_dir = os.path.join(args.out_root, "bitstreams", args.scene)
        params, binaries, bcfg = driver.decode_bundle(stream_dir)
        n = (len(test_ds) if args.max_eval_images is None
             else min(args.max_eval_images, len(test_ds)))
        psnrs = []
        for i in range(n):
            rays, gt = test_ds.image_and_rays(i)
            rgb, _, _ = renderer.render_image(
                params, bcfg.model, bcfg.render,
                jnp.asarray(bcfg.render.aabb), binaries,
                rays.origins, rays.viewdirs, jnp.ones((3,)))
            psnrs.append(float(M.psnr(rgb, gt)))
        print(f"decode_only: psnr={np.mean(psnrs):.3f} over {n} images")
        return

    mesh = None
    if args.multichip:
        import jax
        from cnc_tpu.parallel.sharding import make_mesh
        if len(jax.devices()) > 1:
            mesh = make_mesh()
    result = driver.run_pipeline(cfg, train_ds, test_ds, args.scene,
                                 out_root=args.out_root,
                                 max_eval_images=args.max_eval_images,
                                 mesh=mesh)
    driver.append_result_row(result, args.scene, dataset_name, args.out_root)
    print(f"psnr={result.psnr:.3f} psnr_codec={result.psnr_codec:.3f} "
          f"size={result.embed_MB_codec:.4f}MB")


if __name__ == "__main__":
    main()
