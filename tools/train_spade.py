#!/usr/bin/env python
"""Train the SPADE shading generator (GAN) on TPU.

The reference ships the SPADE GAN inference path only (its trainer was
never released — SURVEY C20); this driver makes the shading stack fully
trainable: SPADEGenerator4 + MultiscaleDiscriminator with hinge loss +
feature matching (sln_tpu.spade.losses).

Data: without real photoreal renders, `--synthetic` builds (seg, rgb)
pairs from the rasterizer's semantic+depth channels with a deterministic
class-color shading target — enough to exercise and validate the training
loop end-to-end. Point --pairs_dir at .npz files with arrays `seg`
(H, W, 41) and `rgb` (H, W, 3 in [-1, 1]) for real data.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def synthetic_pairs(num_rooms: int, crop: int, seed: int = 0):
    """(seg (N,H,W,41), rgb (N,H,W,3)) from rasterized synthetic rooms."""
    from sln_tpu.config import default_config
    from sln_tpu.workloads import gan_shade

    cfg = default_config()
    # shared render loop + shading target (gan_shade.py) so the trainer,
    # bench quality line, and tests all measure against the same pipeline
    segs = gan_shade.render_spade_inputs(num_rooms, cfg, crop,
                                         synthetic_seed=seed)
    rgbs = np.asarray(gan_shade.shading_target(segs), np.float32)
    return segs, rgbs


def load_pairs_dir(path: str):
    segs, rgbs = [], []
    for f in sorted(os.listdir(path)):
        if f.endswith(".npz"):
            d = np.load(os.path.join(path, f))
            segs.append(d["seg"])
            rgbs.append(d["rgb"])
    return np.stack(segs), np.stack(rgbs)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--pairs_dir", default="")
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--ngf", type=int, default=32)
    p.add_argument("--ndf", type=int, default=32)
    p.add_argument("--nz", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr_g", type=float, default=1e-4)
    p.add_argument("--lr_d", type=float, default=4e-4)
    p.add_argument("--print_every", type=int, default=20)
    p.add_argument("--eval_every", type=int, default=200,
                   help="report held-out L1/PSNR every N steps")
    p.add_argument("--val_frac", type=float, default=0.125,
                   help="fraction of pairs held out for eval")
    p.add_argument("--lambda_l1", type=float, default=50.0,
                   help="direct pixel L1 weight on G (the stand-in for "
                        "the VGG perceptual term SPADE recipes pair with "
                        "feature matching; 0 disables)")
    p.add_argument("--output_dir", default="./checkpoints_spade")
    p.add_argument("--artifact", default="",
                   help="also write a serving-only artifact here "
                        "(g_params in float16 + config; what "
                        "gan_shade.make_spade_model loads)")
    p.add_argument("--save_every", type=int, default=0,
                   help="checkpoint every N steps (0: only at the end)")
    p.add_argument("--resume", default="",
                   help="warm-start G/D (+E) params and spectral-norm "
                        "state from a previous spade_gan.ckpt (optimizer "
                        "state restarts fresh — the checkpoint does not "
                        "store it)")
    p.add_argument("--mmd", action="store_true",
                   help="MMD training mode: MMD discriminators "
                        "(decide + z_out heads) + ConvEncoderPSPSEMMD "
                        "with z-regression, reconstruction, and "
                        "MMD-to-prior losses (the objective behind the "
                        "reference's unused *_MMD classes, "
                        "SPADE_related.py:909-979,1237-1398)")
    p.add_argument("--nef", type=int, default=16,
                   help="MMD encoder width")
    p.add_argument("--lr_e", type=float, default=1e-4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    import pickle

    from sln_tpu.spade.discriminator import MultiscaleDiscriminator
    from sln_tpu.spade.generator import SPADEGenerator4
    from sln_tpu.spade.losses import GanState, make_gan_train_step

    if args.pairs_dir:
        segs, rgbs = load_pairs_dir(args.pairs_dir)
    else:
        n = args.synthetic or 32
        print(f"| rendering {n} synthetic (seg, rgb) pairs at {args.crop}px")
        segs, rgbs = synthetic_pairs(n, args.crop)
    n_val = max(1, int(len(segs) * args.val_frac)) if args.eval_every else 0
    # never let the held-out split consume the whole dataset
    n_val = min(n_val, len(segs) - 1)
    if n_val <= 0:
        if args.eval_every:
            print("| dataset too small to hold out a val split; "
                  "disabling eval", flush=True)
        n_val = 0
    n_total = int(len(segs))
    val_segs, val_rgbs = segs[:n_val], rgbs[:n_val]
    segs, rgbs = segs[n_val:], rgbs[n_val:]
    print(f"| dataset: {segs.shape} -> {rgbs.shape} (+{n_val} held out)")

    # Identity of the held-out split, stamped into every checkpoint so a
    # --resume under different --val_frac/--eval_every/dataset contents
    # can't silently grade "held-out" quality on images the warm-started
    # generator already trained on (the split is the FRONT of the sorted
    # deterministic dataset, so any boundary shift leaks training data
    # into val).
    import hashlib
    if args.pairs_dir:
        names = sorted(f for f in os.listdir(args.pairs_dir)
                       if f.endswith(".npz"))
        # content digest per file: rewriting a file's CONTENTS in place
        # (same name, even same size/mtime) changes the split identity,
        # while metadata churn that keeps bytes identical (rsync, git
        # checkout touching mtimes) does NOT spuriously taint resumes.
        # Digests are memoized in .split_digests.json keyed by
        # (size, mtime_ns, ctime_ns) so big pair dirs don't pay a full
        # re-hash of every file on every trainer start — only changed
        # files re-hash. ctime_ns is in the key because userspace cannot
        # forge it: an in-place rewrite that restores size AND mtime
        # (tests pin this case) still bumps ctime, so the memo can never
        # serve a stale digest for changed bytes; metadata churn merely
        # re-hashes without changing the identity.
        import json as _json
        cache_path = os.path.join(args.pairs_dir, ".split_digests.json")
        try:
            with open(cache_path) as fh:
                dcache = _json.load(fh)
        except Exception:
            dcache = {}

        def _digest(name):
            path = os.path.join(args.pairs_dir, name)
            st = os.stat(path)
            key = f"{st.st_size}:{st.st_mtime_ns}:{st.st_ctime_ns}"
            hit = dcache.get(name)
            if hit and hit.get("key") == key:
                return hit["sha"]
            h = hashlib.sha1()
            with open(path, "rb") as fh:
                for block in iter(lambda: fh.read(1 << 20), b""):
                    h.update(block)
            sha = h.hexdigest()[:12]
            dcache[name] = {"key": key, "sha": sha}
            return sha

        src = "pairs:" + ",".join(
            "%s:%s" % (f, _digest(f)) for f in names)
        try:
            with open(cache_path, "w") as fh:
                _json.dump(dcache, fh)
        except OSError:
            pass  # read-only pairs dir: just skip the memo
    else:
        src = f"synthetic:{args.synthetic or 32}:{args.crop}"
    val_split = {"source": hashlib.sha1(src.encode()).hexdigest()[:12],
                 "n_val": n_val, "n_total": n_total}
    val_heldout_clean = True

    gen = SPADEGenerator4(ngf=args.ngf, nz=args.nz, crop_size=args.crop)
    disc = MultiscaleDiscriminator(ndf=args.ndf, n_layers=3, num_d=2,
                                   mmd_nz=args.nz if args.mmd else 0)
    B = args.batch_size
    seg0 = jnp.asarray(segs[:B])
    z0 = jax.random.normal(jax.random.PRNGKey(0), (B, args.nz))
    g_vars = gen.init(jax.random.PRNGKey(0), seg0, z0)
    d_vars = disc.init(jax.random.PRNGKey(1),
                       jnp.concatenate([seg0, jnp.asarray(rgbs[:B])], -1),
                       False)
    g_tx = optax.adam(args.lr_g, b1=0.0, b2=0.9)
    d_tx = optax.adam(args.lr_d, b1=0.0, b2=0.9)
    if args.mmd:
        from sln_tpu.spade.encoders import ConvEncoderPSPSEMMD
        from sln_tpu.spade.losses import (MmdGanState,
                                          make_mmd_gan_train_step)
        enc = ConvEncoderPSPSEMMD(nef=args.nef, output_nc=args.nz)
        e_vars = enc.init(jax.random.PRNGKey(3), jnp.asarray(rgbs[:B]),
                          False)
        e_tx = optax.adam(args.lr_e, b1=0.0, b2=0.9)
        state = MmdGanState(
            g_params=g_vars["params"], d_params=d_vars["params"],
            d_spectral=d_vars.get("spectral", {}),
            e_params=e_vars["params"],
            e_spectral=e_vars.get("spectral", {}),
            g_opt=g_tx.init(g_vars["params"]),
            d_opt=d_tx.init(d_vars["params"]),
            e_opt=e_tx.init(e_vars["params"]),
            step=jnp.zeros((), jnp.int32))
        step = make_mmd_gan_train_step(gen, disc, enc, g_tx, d_tx, e_tx,
                                       lambda_l1=args.lambda_l1)
    else:
        state = GanState(
            g_params=g_vars["params"], d_params=d_vars["params"],
            d_spectral=d_vars.get("spectral", {}),
            g_opt=g_tx.init(g_vars["params"]),
            d_opt=d_tx.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32))
        step = make_gan_train_step(gen, disc, g_tx, d_tx,
                                   lambda_l1=args.lambda_l1)

    start_step = 0
    if args.resume:
        with open(args.resume, "rb") as f:
            prev = pickle.load(f)

        def cast(tree):
            return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tree)

        state = state._replace(g_params=cast(prev["g_params"]))
        if "d_params" in prev:
            state = state._replace(d_params=cast(prev["d_params"]))
        if "d_spectral" in prev:
            # restore the spectral-norm power-iteration u vectors too, so
            # resumed runs don't re-converge D's normalization from init
            state = state._replace(d_spectral=cast(prev["d_spectral"]))
        if args.mmd and "e_params" in prev:
            state = state._replace(e_params=cast(prev["e_params"]))
        if args.mmd and "e_spectral" in prev:
            state = state._replace(e_spectral=cast(prev["e_spectral"]))
        start_step = int(prev.get("config", {}).get("trained_steps", 0))
        print(f"| warm-started params from {args.resume} "
              f"(previously trained {start_step} steps)", flush=True)
        prev_split = prev.get("config", {}).get("val_split")
        # taint persists across resume CHAINS: a checkpoint already
        # stamped val_heldout_clean=False (e.g. an earlier val_frac
        # change) stays dirty even when this resume's split matches —
        # the warm-started params trained on rooms in the current val set
        val_heldout_clean = bool(
            prev.get("config", {}).get("val_heldout_clean", False))
        if prev_split != val_split:
            # the warm-started params may have trained on rooms now in
            # the val split — val_psnr/val_l1 from this run are NOT
            # held-out-clean; stamp that into the checkpoint config
            val_heldout_clean = False
            print("| WARNING: held-out split differs from the resumed "
                  f"run's ({prev_split} -> {val_split}); val metrics "
                  "from this run may grade on previously-trained images "
                  "and will be stamped val_heldout_clean=False",
                  flush=True)

    # held-out L1 (on [-1,1]) / PSNR (on [0,1]) — the same jitted metric
    # the bench's spade_shading_psnr line uses (gan_shade.py)
    from sln_tpu.workloads.gan_shade import make_shading_metrics
    val_metrics = make_shading_metrics(gen)

    # device-resident val set (same host-buffer-leak avoidance as below)
    val_segs_d = jnp.asarray(val_segs) if n_val else None
    val_rgbs_d = jnp.asarray(val_rgbs) if n_val else None

    def run_eval(g_params):
        """Chunked over the val set (val batches can exceed train B).
        Accumulates MSE and takes ONE log at the end, so the reported
        PSNR equals the bench's one-shot computation over the same rooms
        (mean-of-PSNRs would be biased high)."""
        l1s, mses = [], []
        for s in range(0, n_val, B):
            seg = val_segs_d[s:s + B]
            z = jax.random.normal(jax.random.PRNGKey(7 + s),
                                  (seg.shape[0], args.nz))
            l1, _, mse = val_metrics(g_params, seg,
                                     val_rgbs_d[s:s + B], z)
            l1s.append(float(l1) * seg.shape[0])
            mses.append(float(mse) * seg.shape[0])
        from sln_tpu.workloads.gan_shade import psnr_from_mse
        return sum(l1s) / n_val, psnr_from_mse(sum(mses) / n_val)

    def save(state, t, extra):
        os.makedirs(args.output_dir, exist_ok=True)
        out = os.path.join(args.output_dir, "spade_gan.ckpt")
        # trained_steps is stamped from the loop counter at every save, not
        # from the last eval tick, so --resume accounting stays exact even
        # for checkpoints written between evals (or with --eval_every 0)
        config = {**vars(args), **extra,
                  "trained_steps": start_step + t,
                  "val_split": val_split,
                  "val_heldout_clean": val_heldout_clean}
        payload = {
            "g_params": jax.tree.map(np.asarray, state.g_params),
            "d_params": jax.tree.map(np.asarray, state.d_params),
            "d_spectral": jax.tree.map(np.asarray, state.d_spectral),
            "config": config}
        if args.mmd:
            payload["e_params"] = jax.tree.map(np.asarray, state.e_params)
            payload["e_spectral"] = jax.tree.map(np.asarray,
                                                 state.e_spectral)
        with open(out, "wb") as f:
            pickle.dump(payload, f)
        print("saved", out, flush=True)
        if args.artifact:
            # serving-only: g_params in fp16 (halves the committed blob;
            # the loader casts back to fp32)
            slim = {"g_params": jax.tree.map(
                        lambda a: np.asarray(a, np.float16)
                        if np.asarray(a).dtype == np.float32
                        else np.asarray(a), state.g_params),
                    "config": config}
            with open(args.artifact, "wb") as f:
                pickle.dump(slim, f)
            print("saved", args.artifact, flush=True)

    # Stage the whole dataset on device ONCE and gather batches on-device.
    # Re-uploading each (B, 256, 256, 41) batch from the host leaks ~96
    # MB/step through the axon tunnel's dispatch buffers (the r3 trainer
    # was OOM-killed at ~130 GB host RSS after ~1350 steps); with
    # device-resident data the per-step transfer is just (B,) indices + z.
    segs_d = jnp.asarray(segs)
    rgbs_d = jnp.asarray(rgbs)

    @jax.jit
    def gather_batch(all_segs, all_rgbs, idx):
        # data as jit ARGUMENTS: closing over them would bake ~1 GB of
        # constants into the program (HTTP 413 over the tunnel, CLAUDE.md)
        return (jnp.take(all_segs, idx, axis=0),
                jnp.take(all_rgbs, idx, axis=0))

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(2)
    last_eval = {}
    import time
    t0 = time.perf_counter()
    for t in range(1, args.steps + 1):
        idx = jnp.asarray(rng.integers(0, len(segs), B))
        z = jax.random.normal(jax.random.fold_in(key, t), (B, args.nz))
        seg_b, rgb_b = gather_batch(segs_d, rgbs_d, idx)
        state, losses = step(state, seg_b, rgb_b, z)
        if t % args.print_every == 0:
            rate = t * B / (time.perf_counter() - t0)
            print(f"step {t} ({rate:.1f} img/s): " + " ".join(
                f"{k[0]}={float(v):.4f}" for k, v in sorted(losses.items())),
                flush=True)
        if args.eval_every and n_val and (t % args.eval_every == 0
                                          or t == args.steps):
            l1, psnr = run_eval(state.g_params)
            last_eval = {"val_l1": l1, "val_psnr": psnr}
            print(f"step {t}: val_l1={l1:.4f} val_psnr={psnr:.2f}dB",
                  flush=True)
        if args.save_every and t % args.save_every == 0:
            save(state, t, last_eval)

    # the periodic save above already wrote this exact payload when steps
    # is a multiple of save_every — don't re-pickle ~0.5 GB back-to-back
    if not (args.save_every and args.steps % args.save_every == 0):
        save(state, args.steps, last_eval)


if __name__ == "__main__":
    main()
