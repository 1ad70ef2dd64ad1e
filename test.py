#!/usr/bin/env python
"""Eval / inference workload dispatcher (TPU-native rebuild of reference
test.py): --batch_gen, --measure_acc_l1_std, --heat_map, --draw_2d,
--fine_tune, --gan_shade.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # workload modes (reference options/options.py:62-68)
    p.add_argument("--batch_gen", action="store_true")
    p.add_argument("--measure_acc_l1_std", action="store_true")
    p.add_argument("--heat_map", action="store_true")
    p.add_argument("--draw_2d", action="store_true")
    p.add_argument("--draw_3d", action="store_true")
    p.add_argument("--fine_tune", action="store_true")
    p.add_argument("--gan_shade", action="store_true")
    # shared config
    p.add_argument("--suncg_train_dir", default="metadata/data_rot_train.json")
    p.add_argument("--suncg_val_dir", default="metadata/data_rot_val.json")
    p.add_argument("--output_dir", default="./checkpoints")
    p.add_argument("--checkpoint_name", default="latest_checkpoint")
    p.add_argument("--test_dir", default="./layouts_out")
    p.add_argument("--manual_seed", default=42, type=int)
    p.add_argument("--batch_size", default=256, type=int)
    # TPU-native additions
    p.add_argument("--synthetic", default=0, type=int,
                   help="use N synthetic rooms instead of SUNCG json")
    p.add_argument("--max_objects", default=32, type=int)
    p.add_argument("--allow_random_weights", action="store_true")
    p.add_argument("--heatmap_iters", default=20000, type=int)
    p.add_argument("--num_z", default=50, type=int,
                   help="z samples for gan_shade (reference test.py:94)")
    p.add_argument("--spade_checkpoint", default="", type=str,
                   help="explicit SPADE generator weights for --gan_shade "
                        "(.pth = ported reference checkpoint, else a "
                        "tools/train_spade.py pickle); default: "
                        "<output_dir>/latest_net_G_AB.pth first "
                        "(test_SPADE_shade.py:9-14), then the committed "
                        "artifacts/spade_gan.ckpt (skipped if trained at "
                        "other dims than --spade_crop/--spade_ngf), then "
                        "random init")
    p.add_argument("--refine_render_size", default=0, type=int,
                   help="override RefineConfig.render_size for --fine_tune "
                        "(256 = strict reference parity; default 96 = the "
                        "loss-pyramid top)")
    p.add_argument("--refine_pyramid", default="", type=str,
                   help="comma-separated PSP pyramid sizes for --fine_tune "
                        "(default 32,48,64,96; reference "
                        "test_render_refine.py:192-217)")
    p.add_argument("--refine_iters", default=0, type=int,
                   help="override RefineConfig.num_iters for --fine_tune "
                        "(default 60, reference test_render_refine.py:269)")
    p.add_argument("--room_ids", default="", type=str,
                   help="comma-separated room ids for --fine_tune")
    p.add_argument("--save_semantic_gifs", action="store_true",
                   help="also dump per-class mask GIFs during --fine_tune "
                        "(reference save_images save_semantic flag)")
    p.add_argument("--blender_path", default="", type=str)
    p.add_argument("--blender_script", default="", type=str)
    p.add_argument("--renderer", default="auto",
                   choices=["auto", "blender", "preview"],
                   help="--draw_3d backend: Cycles via the bundled "
                        "Blender script, the rasterizer-shaded preview "
                        "(no Blender binary needed), or auto = Blender "
                        "when available with preview fallback")
    p.add_argument("--semantic_source", default="rasterizer",
                   choices=["rasterizer", "blender", "files"],
                   help="gan_shade mask/depth source: in-process "
                        "rasterizer (default), a Blender subprocess run "
                        "(the reference pipeline, test.py:79-95), or "
                        "pre-existing files in "
                        "<test_dir>/data/semantic_masks")
    p.add_argument("--spade_crop", default=256, type=int,
                   help="SPADE render size (reference: 256)")
    p.add_argument("--spade_ngf", default=64, type=int,
                   help="SPADE width (reference: 64)")
    p.add_argument("--spade_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="SPADE shading compute dtype; bfloat16 also "
                        "stores the serving weights in bf16 "
                        "(bit-identical output, ~half the HBM weight "
                        "traffic of the bandwidth-bound generator)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="VAE MLP/gconv compute dtype (params stay fp32)")
    # model/data flags the reference test.py inherits from its global
    # Options (options/options.py:18-61); honored when building the model
    # (they matter with --allow_random_weights; a restored checkpoint's
    # weights must match them, same as the reference)
    from sln_tpu.utils.cli import (add_reference_compat_flags,
                                   apply_reference_compat_flags, bool_flag)
    p.add_argument("--dataset", default="suncg", choices=["suncg"])
    p.add_argument("--embedding_dim", default=64, type=int)
    p.add_argument("--gconv_mode", default="feedforward")
    p.add_argument("--gconv_num_layers", default=5, type=int)
    p.add_argument("--mlp_normalization", default="batch", type=str)
    p.add_argument("--use_AE", default=False, type=bool_flag)
    p.add_argument("--decoder_cat", default=True, type=bool_flag)
    p.add_argument("--train_3d", default=True, type=bool_flag)
    p.add_argument("--use_attr_30", default=True, type=bool_flag)
    # train-only flags accepted so any reference invocation parses
    p.add_argument("--KL_loss_weight", default=0.1, type=float)
    p.add_argument("--KL_linear_decay", default=False, type=bool_flag)
    p.add_argument("--learning_rate", default=1e-4, type=float)
    p.add_argument("--num_iterations", default=600000, type=int)
    p.add_argument("--eval_mode_after", default=-1, type=int)
    p.add_argument("--print_every", default=100, type=int)
    p.add_argument("--checkpoint_every", default=1000, type=int)
    p.add_argument("--snapshot_every", default=10000, type=int)
    p.add_argument("--restore_from_checkpoint", default=False,
                   type=bool_flag)
    add_reference_compat_flags(p)
    args = p.parse_args(argv)
    apply_reference_compat_flags(args)
    return args


def build_cfg(args):
    import dataclasses as dc

    from sln_tpu.config import (DataConfig, ModelConfig, SpadeConfig,
                                TrainConfig, default_config)
    cfg = default_config()
    refine = cfg.refine
    if getattr(args, "refine_render_size", 0):
        refine = dc.replace(refine, render_size=args.refine_render_size)
    if getattr(args, "refine_pyramid", ""):
        refine = dc.replace(refine, pyramid_sizes=tuple(
            int(s) for s in args.refine_pyramid.split(",") if s))
    if getattr(args, "refine_iters", 0):
        refine = dc.replace(refine, num_iters=args.refine_iters)
    return cfg.replace(
        refine=refine,
        model=ModelConfig(
            embedding_dim=args.embedding_dim,
            gconv_num_layers=args.gconv_num_layers,
            gconv_mode=args.gconv_mode,
            mlp_normalization=args.mlp_normalization,
            decoder_cat=args.decoder_cat, use_ae=args.use_AE,
            train_3d=args.train_3d, compute_dtype=args.compute_dtype),
        data=DataConfig(max_objects=args.max_objects,
                        max_triples=args.max_objects * 3,
                        max_on_rels=args.max_objects,
                        use_attr_30=args.use_attr_30,
                        train_path=args.suncg_train_dir,
                        val_path=args.suncg_val_dir),
        train=TrainConfig(output_dir=args.output_dir,
                          checkpoint_name=args.checkpoint_name),
        spade=SpadeConfig(crop_size=args.spade_crop, ngf=args.spade_ngf,
                          num_z=args.num_z,
                          compute_dtype=args.spade_dtype),
        test_dir=args.test_dir)


def setup(args, cfg):
    import jax

    from sln_tpu.data.augment import build_graphs
    from sln_tpu.workloads import common

    if args.synthetic:
        train_arrays, size_info = common.load_arrays(args.synthetic, cfg)
        val_arrays, _ = common.load_arrays(max(args.synthetic // 4, 8), cfg,
                                           synthetic_seed=99)
    else:
        train_arrays, size_info = common.load_arrays(cfg.data.train_path,
                                                     cfg)
        val_arrays, _ = common.load_arrays(cfg.data.val_path, cfg)

    b = min(8, train_arrays["objs"].shape[0])
    import jax.numpy as jnp
    example = build_graphs(
        jax.random.PRNGKey(0), jnp.asarray(train_arrays["objs"][:b]),
        jnp.asarray(train_arrays["boxes"][:b]),
        jnp.asarray(train_arrays["angles"][:b]),
        jnp.asarray(train_arrays["obj_mask"][:b]),
        jnp.asarray(train_arrays["room_ids"][:b]), size_info,
        max_on_rels=cfg.data.max_on_rels,
        use_attr_30=cfg.data.use_attr_30)
    model, variables = common.restore_model(cfg, example,
                                            args.allow_random_weights)
    return model, variables, train_arrays, val_arrays, size_info


def main(argv=None):
    args = parse_args(argv)
    cfg = build_cfg(args)
    os.makedirs(args.test_dir, exist_ok=True)

    if args.batch_gen:
        from sln_tpu.workloads import batch_gen
        model, variables, tr, va, si = setup(args, cfg)
        out = batch_gen.run_batch_gen(model, variables, tr, va, si, cfg,
                                      args.test_dir,
                                      batch_size=args.batch_size)
        print("Wrote", out)
        return

    if args.measure_acc_l1_std:
        from sln_tpu.workloads import acc_l1_std, posterior
        model, variables, tr, va, si = setup(args, cfg)
        mean, cov = posterior.get_or_compute_mean_cov(
            model, variables, tr, si, cfg, args.test_dir)
        acc = acc_l1_std.run_acc_l1(model, variables, va, si, cfg, mean, cov,
                                    batch_size=args.batch_size)
        print("PRED, RAND, PERT L1:", acc["l1_pred"], acc["l1_rand"],
              acc["l1_pert"])
        print("PRED, RAND, PERT ACC: ", acc["acc_pred"], acc["acc_rand"],
              acc["acc_pert"])
        std = acc_l1_std.run_std(model, variables, va, si, cfg, mean, cov,
                                 batch_size=args.batch_size)
        print("mean angle std:", std["std_angle"])
        print("mean pos std:", std["std_pos"])
        print("mean sizes std:", std["std_size"])
        return

    if args.heat_map:
        from sln_tpu.workloads import heatmap, posterior
        model, variables, tr, va, si = setup(args, cfg)
        mean, cov = posterior.get_or_compute_mean_cov(
            model, variables, tr, si, cfg, args.test_dir)
        print("Calling network to produce object positions...")
        pkl_path = heatmap.produce_heatmap(model, variables, mean, cov,
                                           args.test_dir,
                                           num_iter=args.heatmap_iters)
        print("Rendering images...")
        heat_dir = os.path.join(args.test_dir, "data", "heat")
        paths = heatmap.plot_heatmap(pkl_path, heat_dir)
        print("Wrote", len(paths), "heatmaps to", heat_dir)
        return

    if args.draw_2d:
        from sln_tpu.workloads.plot2d import plot2d
        # same demo layout as reference test.py:46-53
        exp_boxes = np.array([
            [0.31150928, 0.31271002, 0.00309663, 0.72957528, 0.82625818,
             0.05425087],
            [-0.06599953, 0.01722394, 0.28853789, 0.25737822, 0.75531799,
             0.42857787],
            [0.55675948, 0.01778692, 0.14249095, 0.90461600, 0.31667089,
             0.66919732],
            [0.62057209, 0.01821164, 0.84169930, 0.83482409, 0.38932487,
             0.96370161],
            [0.17114696, 0.01767171, 0.80859685, 0.46015960, 0.50266063,
             0.96572173],
            [0.0, 0.0, 0.0, 1.0, 0.73272365, 0.92786783]])
        exp_rots = [0.00085504, 18.07450676, 6.06250334, 12.16077995,
                    12.01297188, 0.0]
        obj_types = [20, 18, 30, 3, 11, 0]
        save_dir = os.path.join(args.test_dir, "data", "2D_rendered")
        os.makedirs(save_dir, exist_ok=True)
        out = os.path.join(save_dir, "demo.png")
        plot2d(exp_boxes, exp_rots, obj_types, out)
        print("Wrote", out)
        return

    if args.draw_3d:
        # Photoreal Cycles render via the bundled modern-Blender script
        # (sln_tpu/render/blender/render_color.py); same subprocess
        # contract as the reference (testing/test_plot3d.py:4-8). Without
        # a blender binary (or with --renderer preview) the
        # rasterizer-shaded on-device preview renders the same layouts to
        # the same artifact names (sln_tpu/render/preview.py).
        from sln_tpu.render import blender_bridge
        out = os.path.join(args.test_dir, "data", "rendered")
        if args.renderer in ("auto", "blender"):
            try:
                blender_bridge.run_color_render(
                    args.test_dir, args.blender_path or None,
                    args.blender_script or None)
                print(f"Blender render finished; images in {out}")
                return
            except blender_bridge.BlenderNotAvailable as e:
                if args.renderer == "blender":
                    print(f"draw_3d unavailable: {e}")
                    return
                print(f"no Blender binary ({e}); using the rasterizer "
                      "preview renderer")
        from sln_tpu.render import preview
        n = preview.run_preview_renders(args.test_dir)
        print(f"preview render finished; {n} images in {out}")
        return

    if args.fine_tune:
        from sln_tpu.workloads import refine
        model, variables, tr, va, si = setup(args, cfg)
        room_ids = ([s for s in args.room_ids.split(",") if s]
                    or [str(int(va["room_ids"][0]))])
        base = os.path.join(args.test_dir, "data", "finetune")
        os.makedirs(base, exist_ok=True)
        dirs = [os.path.join(base, r) for r in room_ids]
        refine.finetune_rooms(model, variables, va, si, cfg, room_ids, dirs,
                              save_semantic=args.save_semantic_gifs)
        return

    if args.gan_shade:
        from sln_tpu.workloads import gan_shade
        model, variables, tr, va, si = setup(args, cfg)
        out_dir = os.path.join(args.test_dir, "data", "SPADE_out")
        os.makedirs(out_dir, exist_ok=True)
        semantic_dir = None
        if args.semantic_source != "rasterizer":
            semantic_dir = os.path.join(args.test_dir, "data",
                                        "semantic_masks")
            if args.semantic_source == "blender":
                # the reference's two-process chain (test.py:79-95):
                # Blender masks/depth first, then SPADE over the files
                from sln_tpu.render import blender_bridge
                blender_bridge.run_mask_depth_render(
                    args.test_dir, args.blender_path or None,
                    args.blender_script or None)
        gan_shade.run_gan_shade(model, variables, va, si, cfg,
                                num_z=args.num_z, save_dir=out_dir,
                                spade_checkpoint=(args.spade_checkpoint
                                                  or None),
                                semantic_dir=semantic_dir)
        return

    print("No mode selected; see --help")


if __name__ == "__main__":
    main()
