"""Ablate the train step's inverse batch scaling (VERDICT r2 weak #1).

Measures, per batch size, the device time of:
  augment   on-device graph construction alone (build_graphs)
  fwd       graphs + VAE forward + loss
  step      the full train step (fwd + bwd + Adam + NaN guard)

Timing protocol (CLAUDE.md "Measuring time over the axon tunnel"): each
probe is ONE lax.scan over `steps` iterations ending in a reduced checksum
that is fetched with float(); every scan step varies the rng so loop-
invariant code motion cannot hoist the work being measured; 2 windows with
distinct keys, max rate kept.

Usage: python tools/profile_batch_scaling.py [--batches 256,512,1024]
       [--steps 30]  (needs the real chip free)
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256,512,1024")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="",
                    help="override ModelConfig.compute_dtype "
                         "(e.g. bfloat16) for the sweep")
    ap.add_argument("--microbatch", type=int, default=0,
                    help="TrainConfig.microbatch for the step probe: "
                         "batches above this run as gradient accumulation "
                         "over sweet-spot-sized chunks")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sln_tpu.config import default_config
    from sln_tpu.data.augment import build_graphs
    from sln_tpu.train import loop as tl
    from sln_tpu.train.losses import vae_losses
    from sln_tpu.workloads import common

    cfg = default_config()
    if args.dtype or args.microbatch:
        import dataclasses as dc
        if args.dtype:
            cfg = cfg.replace(model=dc.replace(cfg.model,
                                               compute_dtype=args.dtype))
        if args.microbatch:
            cfg = cfg.replace(train=dc.replace(cfg.train,
                                               microbatch=args.microbatch))
    steps = args.steps
    batches = [int(b) for b in args.batches.split(",")]
    arrays, size_info = common.load_arrays(max(batches), cfg,
                                           synthetic_seed=0)

    def timed(make_scan, n_items):
        """Compile, then time 2 perturbed windows; returns items/s."""
        fn = jax.jit(make_scan)
        float(fn(jax.random.PRNGKey(0)))          # compile + warm
        best = 0.0
        for w in (1, 2):
            k = jax.random.PRNGKey(w)
            t0 = time.perf_counter()
            out = float(fn(k))
            dt = time.perf_counter() - t0
            assert np.isfinite(out), out
            best = max(best, steps * n_items / dt)
        return best

    print(f"{'B':>6} {'augment':>12} {'fwd':>12} {'step':>12}   scenes/s")
    rows = {}
    for B in batches:
        raw = tl.RawBatch(*(jnp.asarray(x[:B]) for x in (
            arrays["objs"], arrays["boxes"], arrays["angles"],
            arrays["obj_mask"], arrays["room_ids"])))
        batch0 = build_graphs(jax.random.PRNGKey(0), raw.objs, raw.boxes,
                              raw.angles, raw.obj_mask, raw.room_ids,
                              size_info, max_on_rels=cfg.data.max_on_rels)
        model, state0, tx = tl.create_state(cfg, jax.random.PRNGKey(0),
                                            batch0)

        def augment_scan(key):
            def body(c, k):
                b = build_graphs(k, raw.objs, raw.boxes, raw.angles,
                                 raw.obj_mask, raw.room_ids, size_info,
                                 max_on_rels=cfg.data.max_on_rels)
                return c + b.triples.sum() + b.attrs.sum(), ()
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                jax.random.split(key, steps))
            return c.astype(jnp.float32)

        def fwd_scan(key):
            def body(c, k):
                kg, kz = jax.random.split(k)
                b = build_graphs(kg, raw.objs, raw.boxes, raw.angles,
                                 raw.obj_mask, raw.room_ids, size_info,
                                 max_on_rels=cfg.data.max_on_rels)
                (mu, lv, bp, ap), _ = model.apply(
                    {"params": state0.params,
                     "batch_stats": state0.batch_stats},
                    b, kz, True, mutable=["batch_stats"])
                total, _ = vae_losses(b, mu, lv, bp, ap, 0.1)
                return c + total, ()
            c, _ = jax.lax.scan(body, jnp.zeros(()),
                                jax.random.split(key, steps))
            return c

        step_fn_inner = tl.make_train_step(model, tx, cfg, size_info)

        def step_scan(key):
            # scan the full update; state is the carry (device-resident),
            # rng varies per step like the real loop
            def body(st, k):
                st, losses = step_fn_inner(st, raw, k)
                return st, losses["total_loss"]
            st, tot = jax.lax.scan(body, state0,
                                   jax.random.split(key, steps))
            return tot.sum()

        r_aug = timed(augment_scan, B)
        r_fwd = timed(fwd_scan, B)
        r_step = timed(step_scan, B)
        rows[B] = (r_aug, r_fwd, r_step)
        print(f"{B:>6} {r_aug:>12.0f} {r_fwd:>12.0f} {r_step:>12.0f}")

    b0 = batches[0]
    print("\nper-scene slowdown vs batch", b0, "(1.0 = linear scaling):")
    for B in batches[1:]:
        rel = [rows[b0][i] / rows[B][i] for i in range(3)]
        print(f"  B={B}: augment {rel[0]:.2f}x  fwd {rel[1]:.2f}x  "
              f"step {rel[2]:.2f}x")


if __name__ == "__main__":
    main()
