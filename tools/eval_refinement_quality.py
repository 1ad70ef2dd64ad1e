#!/usr/bin/env python
"""Refinement-quality probe on a trained checkpoint.

For each room: encode GT -> z_gt, perturb z0 = z_gt + sigma * eps, run
the refinement loop against the GT render, and report (a) the render
loss before/after — the loop's actual objective (reference
test_render_refine.py optimizes multi-scale depth/semantic agreement,
NOT box-parameter error) — plus (b) box-L1/z-distance diagnostics.

Measured behavior on synthetic data (v5e, 2026-08): the reference's
refinement is a render-alignment nudge, not a latent-space correction.
Box-L1 recovery through z is weak everywhere: the synthetic scene
graphs nearly determine the layout, so the decoder leans on the graph
and box outputs respond only mildly to z (free bits keeps the KL up
but cannot force the decoder to rely on z); the z learning rate of
2e-4 x 60 iters (reference :286) moves z by <1e-3.

On the SHIPPED checkpoint (artifacts/latest_bench_with_model.ckpt) the
controlled sweep tools/sweep_refinement.py -> artifacts/refine_sweep.json
(lr_z 2e-4..0.1, 60/240 iters, sigma 0.5/1/2, 8 rooms) settles the
layout-IoU question: NO configuration reaches +0.01 IoU, and none can —
decoding the exact GT-encoded z scores LOWER rotated-cuboid IoU (0.122)
than the sigma=1-perturbed start (0.1234), i.e. the encode/decode round
trip itself loses more IoU than the perturbation does, so +IoU through
z is unreachable by construction. The reference hyperparameters give
iou_delta +0.001 with a ~2.5% render-loss cut on this checkpoint
(bench.py refine_iou_delta ~0 is therefore expected behavior, not a
regression); the best sweep row is +0.004 (sigma=2, from a much worse
start). The larger ~12-16% render-loss cuts quoted in earlier notes
were measured on OTHER checkpoints (3k plain / 20k free-bits) whose
initial renders sit further from the target.

Usage:
  python tools/eval_refinement_quality.py --output_dir <ckpt dir> \
      [--checkpoint_name latest_checkpoint] [--rooms 4] [--sigma 1.0] \
      [--lr_z 0.05] [--num_iters 120]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", default="./checkpoints")
    p.add_argument("--checkpoint_name", default="latest_checkpoint")
    p.add_argument("--rooms", type=int, default=4)
    p.add_argument("--sigma", type=float, default=1.0,
                   help="z perturbation scale")
    p.add_argument("--num_iters", type=int, default=60)
    p.add_argument("--lr_z", type=float, default=0.0,
                   help="override RefineConfig.lr_z (0 = reference 2e-4)")
    p.add_argument("--render_size", type=int, default=96)
    p.add_argument("--seed", type=int, default=13)
    args = p.parse_args(argv)

    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from sln_tpu.config import DataConfig, TrainConfig, default_config
    from sln_tpu.data.augment import build_graphs
    from sln_tpu.models.vae import Sg2ScVAE
    from sln_tpu.render import assets, scene as scene_lib
    from sln_tpu.workloads import common, refine

    B = args.rooms
    cfg = default_config().replace(
        data=DataConfig(max_objects=16, max_triples=48, max_on_rels=16),
        train=TrainConfig(output_dir=args.output_dir,
                          checkpoint_name=args.checkpoint_name))
    refine_over = dict(render_size=args.render_size,
                       num_iters=args.num_iters)
    if args.lr_z > 0:
        refine_over["lr_z"] = args.lr_z
    cfg = cfg.replace(refine=dc.replace(cfg.refine, **refine_over))
    val_arrays, size_info = common.load_arrays(max(B, 8), cfg,
                                               synthetic_seed=11)
    batch = build_graphs(
        jax.random.PRNGKey(0), jnp.asarray(val_arrays["objs"][:B]),
        jnp.asarray(val_arrays["boxes"][:B]),
        jnp.asarray(val_arrays["angles"][:B]),
        jnp.asarray(val_arrays["obj_mask"][:B]),
        jnp.asarray(val_arrays["room_ids"][:B]), size_info,
        max_on_rels=16)
    model, variables = common.restore_model(cfg, example_batch=batch)

    # z_gt from the posterior mean; z0 perturbed (the experiment's knob)
    mu, logvar = model.apply(variables, batch, False,
                             method=Sg2ScVAE.encode)
    key = jax.random.PRNGKey(args.seed)
    z_gt = mu
    z0 = z_gt + args.sigma * jax.random.normal(key, z_gt.shape)

    rcfg = dc.replace(cfg.render, camera=dc.replace(
        cfg.render.camera, image_size=cfg.refine.render_size))
    bank_host = assets.build_procedural_bank(cfg.render.mesh_subdiv)
    bank = scene_lib.device_bank(bank_host, cfg.render.shell_subdiv)
    room_row = (batch.boxes * batch.room_mask[..., None]).sum(
        1, keepdims=True)
    dims = np.asarray(room_row)[:, 0, 3:]
    abs_gt = np.asarray(batch.boxes) * np.concatenate(
        [dims, dims], -1)[:, None, :]
    midx = jnp.stack([
        assets.retrieve_models(batch.objs[b], jnp.asarray(abs_gt[b]),
                               bank_host) for b in range(B)])
    target = jax.vmap(
        lambda o, bx, a, m, mi: scene_lib.render_layout(
            o, bx, a, m, mi, bank, rcfg))(
        batch.objs, batch.boxes, batch.angles.astype(jnp.float32),
        batch.obj_mask, midx)
    size_t = jnp.asarray(abs_gt[:, :, 3:] - abs_gt[:, :, :3])
    tx, step, snapshot, run_scan = refine.make_refine_step(
        model, variables.get("batch_stats", {}), batch, midx, bank,
        target, size_t, room_row, cfg)

    def box_l1(z, params):
        boxes_pred, _ = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            z, batch, False, method=Sg2ScVAE.decode)
        m = batch.obj_mask[..., None].astype(jnp.float32)
        return float((jnp.abs(boxes_pred - batch.boxes) * m).sum()
                     / jnp.maximum(m.sum() * 6.0, 1.0))

    params = variables["params"]
    opt = tx.init((z0, params))
    state = refine.RefineState(z0, params, opt, jnp.zeros((), jnp.int32))
    keys = jax.random.split(jax.random.PRNGKey(args.seed + 1),
                            args.num_iters)
    bstats = variables.get("batch_stats", {})
    l1_before = box_l1(z0, params)
    iou_before = float(refine.decoded_layout_iou(model, bstats, batch,
                                                 z0, params))
    zdist_before = float(jnp.abs(z0 - z_gt).mean())
    state, aux = run_scan(state, keys)
    l1_after = box_l1(state.z, state.params)
    iou_after = float(refine.decoded_layout_iou(model, bstats, batch,
                                                state.z, state.params))
    zdist_after = float(jnp.abs(state.z - z_gt).mean())
    l1_gtz = box_l1(z_gt, params)
    iou_gtz = float(refine.decoded_layout_iou(model, bstats, batch,
                                              z_gt, params))

    recovered = (l1_before - l1_after) / max(l1_before - l1_gtz, 1e-9)
    print(json.dumps({
        "rooms": B, "sigma": args.sigma, "iters": args.num_iters,
        "box_l1_perturbed": round(l1_before, 5),
        "box_l1_refined": round(l1_after, 5),
        "box_l1_at_z_gt": round(l1_gtz, 5),
        "iou_perturbed": round(iou_before, 4),
        "iou_refined": round(iou_after, 4),
        "iou_at_z_gt": round(iou_gtz, 4),
        "recovered_fraction": round(float(recovered), 4),
        "z_l1_before": round(zdist_before, 5),
        "z_l1_after": round(zdist_after, 5),
        "loss_first": round(float(np.asarray(aux["total"])[0]), 4),
        "loss_last": round(float(np.asarray(aux["total"])[-1]), 4),
    }))


if __name__ == "__main__":
    main()
