#!/usr/bin/env python
"""Train the scene-graph VAE (TPU-native rebuild of reference train.py).

CLI compatible with the reference's flags (options/options.py) plus
`--synthetic N` to train on procedurally generated rooms when SUNCG
metadata is unavailable.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sln_tpu.config import (Config, DataConfig, ModelConfig, TrainConfig,
                            default_config)
from sln_tpu.data import synthetic, tensorize
from sln_tpu.data.augment import SizeInfo, build_graphs
from sln_tpu.data.vocab import VOCAB
from sln_tpu.parallel import mesh as meshlib
from sln_tpu.train import checkpoint as ckpt_lib
from sln_tpu.train import loop as train_loop


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # reference flags (options/options.py:18-59)
    p.add_argument("--dataset", default="suncg", choices=["suncg"])
    p.add_argument("--suncg_train_dir", default="metadata/data_rot_train.json")
    p.add_argument("--suncg_val_dir", default="metadata/data_rot_val.json")
    p.add_argument("--embedding_dim", default=64, type=int)
    p.add_argument("--gconv_mode", default="feedforward")
    p.add_argument("--gconv_num_layers", default=5, type=int)
    p.add_argument("--mlp_normalization", default="batch", type=str)
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--num_iterations", default=600000, type=int)
    p.add_argument("--eval_mode_after", default=-1, type=int)
    p.add_argument("--learning_rate", default=1e-4, type=float)
    p.add_argument("--print_every", default=100, type=int)
    p.add_argument("--checkpoint_every", default=1000, type=int)
    p.add_argument("--snapshot_every", default=10000, type=int)
    p.add_argument("--output_dir", default="./checkpoints")
    p.add_argument("--checkpoint_name", default="latest_checkpoint")
    p.add_argument("--restore_from_checkpoint", default=False,
                   type=lambda s: s in ("1", "true", "True"))
    p.add_argument("--test_dir", default="./layouts_out")
    p.add_argument("--KL_loss_weight", default=0.1, type=float)
    p.add_argument("--use_AE", default=False,
                   type=lambda s: s in ("1", "true", "True"))
    p.add_argument("--decoder_cat", default=True,
                   type=lambda s: s in ("1", "true", "True"))
    p.add_argument("--train_3d", default=True,
                   type=lambda s: s in ("1", "true", "True"))
    p.add_argument("--KL_linear_decay", default=False,
                   type=lambda s: s in ("1", "true", "True"))
    p.add_argument("--use_attr_30", default=True,
                   type=lambda s: s in ("1", "true", "True"))
    p.add_argument("--manual_seed", default=42, type=int)
    # TPU-native additions
    p.add_argument("--KL_free_bits", default=0.0, type=float,
                   help="per-dim KL floor (free bits); 0 = reference "
                        "parity. Guards refinement against posterior "
                        "collapse on long runs (CLAUDE.md modeling note)")
    p.add_argument("--synthetic", default=0, type=int,
                   help="train on N synthetic rooms instead of SUNCG json")
    p.add_argument("--max_objects", default=32, type=int)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="MLP/gconv compute dtype (params stay fp32)")
    p.add_argument("--num_data_shards", default=None, type=int,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--microbatch", default=0, type=int,
                   help="gradient-accumulation chunk size (0 = off): "
                        "large per-chip batches run as a scan of "
                        "microbatch-sized fwd/bwd passes with one update")
    p.add_argument("--stage_on_device", default=None,
                   type=lambda s: s in ("1", "true", "True"),
                   help="device_put the dataset once and gather batches "
                        "on device (per-step H2D = indices + rng only; "
                        "the per-step batch upload leaks host RSS over "
                        "the axon tunnel). Default: on for single-process"
                        " runs, off multi-host (which needs the per-host "
                        "sharded input pipeline)")
    from sln_tpu.utils.cli import (add_reference_compat_flags,
                                   apply_reference_compat_flags)
    add_reference_compat_flags(p)
    args = p.parse_args(argv)
    apply_reference_compat_flags(args)
    return args


def config_from_args(args) -> Config:
    cfg = default_config()
    return cfg.replace(
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
        train=TrainConfig(
            batch_size=args.batch_size, num_iterations=args.num_iterations,
            learning_rate=args.learning_rate,
            kl_loss_weight=args.KL_loss_weight,
            kl_linear_decay=args.KL_linear_decay,
            kl_free_bits=args.KL_free_bits, seed=args.manual_seed,
            microbatch=args.microbatch,
            print_every=args.print_every,
            checkpoint_every=args.checkpoint_every,
            snapshot_every=args.snapshot_every,
            output_dir=args.output_dir,
            checkpoint_name=args.checkpoint_name),
        test_dir=args.test_dir)


def load_training_data(args, cfg: Config):
    """Returns (arrays, size_info)."""
    if args.synthetic:
        print(f"| generating {args.synthetic} synthetic rooms")
        rooms = synthetic.generate_rooms(args.synthetic, seed=cfg.train.seed)
    else:
        print(f"| loading {cfg.data.train_path}")
        rooms = tensorize.load_rooms(cfg.data.train_path)
    arrays = tensorize.tensorize_rooms(rooms, cfg.data.max_objects)
    t, m, a = synthetic.default_size_table()
    size_info = SizeInfo(jnp.asarray(t), jnp.asarray(m), jnp.asarray(a))
    return arrays, size_info


def main(argv=None):
    args = parse_args(argv)
    cfg = config_from_args(args)
    print("| options")
    for k, v in sorted(vars(args).items()):
        print(f"{k}: {v}")

    arrays, size_info = load_training_data(args, cfg)
    n_rooms = arrays["objs"].shape[0]
    n_objects = int(arrays["obj_mask"].sum()) - n_rooms
    print(f"Training dataset has {n_rooms} scenes and {n_objects} objects")

    mesh = meshlib.make_mesh(num_data=args.num_data_shards)
    print(f"| mesh: {mesh.shape} over {len(jax.devices())} devices")

    # example batch for init
    bs = cfg.train.batch_size
    raw0 = next(train_loop.batches_from_arrays(
        arrays, bs, np.random.default_rng(cfg.train.seed)))
    example = build_graphs(jax.random.PRNGKey(0), *raw0[:4],
                           raw0.room_ids, size_info,
                           max_on_rels=cfg.data.max_on_rels,
                           use_attr_30=cfg.data.use_attr_30)

    model, state, tx = train_loop.create_state(
        cfg, jax.random.PRNGKey(cfg.train.seed), example)
    # stage-once fast path: default on for single-process runs (the
    # per-step batch upload leaks host RSS over the axon tunnel and pays
    # ~batch-size of H2D each step); multi-host keeps the per-host
    # sharded input pipeline, where each host genuinely owns new rows
    stage = args.stage_on_device
    if stage is None:
        stage = jax.process_count() == 1
    bsh = meshlib.batch_sharding(mesh) if stage else None
    step_fn = train_loop.make_train_step(model, tx, cfg, size_info,
                                         staged=stage, batch_sharding=bsh)
    eval_step_fn = None
    if args.eval_mode_after >= 0:
        eval_step_fn = train_loop.make_train_step(
            model, tx, cfg, size_info, eval_mode=True, staged=stage,
            batch_sharding=bsh)

    ckpt = ckpt_lib.new_checkpoint({k: str(v) for k, v in vars(args).items()},
                                   VOCAB.to_dict())
    t, epoch = 0, 0
    if args.restore_from_checkpoint:
        restored = ckpt_lib.load_checkpoint(
            ckpt_lib.latest_path(cfg.train.output_dir,
                                 cfg.train.checkpoint_name))
        if restored is not None:
            print("Restoring from checkpoint")
            ckpt = restored
            ms = restored["model_state"]
            state = train_loop.TrainState(
                params=ms["params"], batch_stats=ms["batch_stats"],
                opt_state=restored["optim_state"],
                step=jnp.asarray(restored["counters"]["t"], jnp.int32))
            t = restored["counters"]["t"]
            epoch = restored["counters"]["epoch"]

    state = meshlib.replicate(state, mesh)
    rng_np = np.random.default_rng(cfg.train.seed + 1)
    step_rng = jax.random.PRNGKey(cfg.train.seed)
    from sln_tpu.train.metrics import MetricsLogger
    metrics = MetricsLogger(os.path.join(cfg.train.output_dir,
                                         "metrics.jsonl"))
    staged = None
    if stage:
        print("| staging dataset on device (gathers run on device; "
              "per-step H2D = indices + rng)")
        staged = train_loop.stage_arrays(arrays, meshlib.replicated(mesh))
    t0 = time.time()
    while t < cfg.train.num_iterations:
        epoch += 1
        print(f"Starting epoch {epoch}")
        # Input pipeline, two modes sharing ONE permutation stream
        # (train_loop.batch_indices), so they consume the identical
        # global batch sequence:
        #  - staged (single-host): the dataset lives on device; only the
        #    (B,) index vector crosses host->device per step
        #  - per-host sharded (multi-host): each host iterates only its
        #    disjoint shard of the shared global permutation and
        #    contributes its rows via make_array_from_process_local_data
        #    — SURVEY §2.10's multi-host plan replacing the reference's
        #    8-worker DataLoader
        epoch_iter = (
            train_loop.batch_indices(n_rooms, bs, rng_np) if stage
            else train_loop.host_sharded_batches(arrays, bs, rng_np))
        for item in epoch_iter:
            if t >= cfg.train.num_iterations:
                break
            t += 1
            # switch to frozen-BN steps past --eval_mode_after
            # (reference train.py:63-65)
            active_step = step_fn
            if eval_step_fn is not None and t >= args.eval_mode_after:
                active_step = eval_step_fn
            if stage:
                state, losses = active_step(state, staged,
                                            jnp.asarray(item), step_rng)
            else:
                raw = meshlib.global_from_host_shards(item, mesh, bs)
                state, losses = active_step(state, raw, step_rng)

            if t % cfg.train.print_every == 0:
                losses = {k: float(v) for k, v in losses.items()}
                rate = cfg.train.print_every * bs / max(time.time() - t0,
                                                        1e-9)
                t0 = time.time()
                print(f"On batch {t} out of {cfg.train.num_iterations} "
                      f"({rate:.0f} scenes/s)")
                for name, val in losses.items():
                    print(f" [{name}]: {val:.4f}")
                ckpt_lib.record_losses(ckpt, t, losses)
                metrics.log(t, scenes_per_sec=rate, **losses)

            if t % cfg.train.checkpoint_every == 0:
                path = ckpt_lib.save_checkpoint(
                    ckpt, cfg.train.output_dir, cfg.train.checkpoint_name,
                    t, epoch,
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    state.opt_state,
                    snapshot=(t % cfg.train.snapshot_every == 0))
                print("Saving checkpoint to", path)
    print("done")


if __name__ == "__main__":
    main()
