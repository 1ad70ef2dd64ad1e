"""Probe: factored SPADE serving throughput on the real chip.

Measures the seg-precompute + z-decode split (SPADEGenerator4.seg_mods /
decode) against the unfactored full forward, both as one scanned device
program with a fetched checksum (CLAUDE.md "Measuring time over the axon
tunnel"). The decode scan varies z per step; the modulation stacks are
loop-invariant BY DESIGN (seg is fixed per room in the gan_shade workload,
testing/test_SPADE_shade.py:74-80).

Usage: python tools/profile_spade_factored.py [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="")
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from sln_tpu.config import default_config
    from sln_tpu.workloads.gan_shade import make_spade_model

    cfg = default_config()
    if args.dtype:
        cfg = cfg.replace(spade=dc.replace(cfg.spade,
                                           compute_dtype=args.dtype))
    model, params = make_spade_model(cfg)
    S = model.crop_size
    rng = np.random.default_rng(0)
    seg_host = rng.uniform(0, 1, (1, S, S, 41)).astype(np.float32)
    seg_host[..., 0] = seg_host[..., 0] * 2 - 1
    seg = jnp.asarray(seg_host)
    zs = jax.random.normal(jax.random.PRNGKey(0),
                           (args.steps, args.batch, model.nz))

    @jax.jit
    def premods(p, seg):
        return model.apply({"params": p}, seg, method="seg_mods")

    def scan_decode(p, mods, zs):
        def body(acc, z):
            out = model.apply({"params": p}, mods, z, method="decode")
            return acc + out.mean(), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(()), zs)
        return acc

    run_dec = jax.jit(scan_decode)

    def scan_full(p, s, zs):
        def body(acc, z):
            s_step = s + 1e-6 * z[:, :1, None, None]
            s_b = jnp.broadcast_to(s_step, (z.shape[0],) + s.shape[1:])
            out = model.apply({"params": p}, s_b, z)
            return acc + out.mean(), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(()), zs)
        return acc

    run_full = jax.jit(scan_full)

    # --- factored: premods once + decode scan
    mods = premods(params, seg)
    float(jax.tree.leaves(mods)[0].sum())               # sync premods
    float(run_dec(params, mods, zs))                    # compile + warm
    best = 0.0
    for w in range(3):
        t0 = time.perf_counter()
        float(run_dec(params, mods, zs * (1.0 + 1e-4 * (w + 1))))
        dt = time.perf_counter() - t0
        best = max(best, args.steps * args.batch / dt)
        print(f"decode window {w}: {args.steps*args.batch/dt:.1f} imgs/s")

    # premods cost (amortized once per room over 50 z in the workload)
    t0 = time.perf_counter()
    for w in range(3):
        m2 = premods(params, seg * (1.0 + 1e-4 * (w + 1)))
        float(jax.tree.leaves(m2)[0].sum())
    t_pre = (time.perf_counter() - t0) / 3
    print(f"premods: {t_pre*1e3:.1f} ms/room")

    # --- unfactored full forward (seg perturbed per step, the honest
    # cold-seg number from bench_spade)
    float(run_full(params, seg, zs))
    best_full = 0.0
    for w in range(2):
        t0 = time.perf_counter()
        float(run_full(params, seg, zs * (1.0 + 2e-4 * (w + 1))))
        dt = time.perf_counter() - t0
        best_full = max(best_full, args.steps * args.batch / dt)
        print(f"full window {w}: {args.steps*args.batch/dt:.1f} imgs/s")

    n50 = 50
    room_time = t_pre + n50 / best
    print(f"\nfactored decode: {best:.1f} imgs/s")
    print(f"unfactored full: {best_full:.1f} imgs/s")
    print(f"per-room (50 z incl premods): {n50/room_time:.1f} imgs/s")


if __name__ == "__main__":
    main()
