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
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sln_tpu.config import default_config
    from sln_tpu.data.augment import build_graphs
    from sln_tpu.render import assets, scene as scene_lib
    from sln_tpu.workloads import common, gan_shade
    from sln_tpu.workloads.plot2d import MAPPED_COLORS

    cfg = default_config()
    arrays, size_info = common.load_arrays(num_rooms, cfg,
                                           synthetic_seed=seed)
    rcfg = dataclasses.replace(cfg.render, camera=dataclasses.replace(
        cfg.render.camera, image_size=crop))
    bank_host = assets.build_procedural_bank(cfg.render.mesh_subdiv)
    bank = scene_lib.device_bank(bank_host, cfg.render.shell_subdiv)
    colors = np.asarray(MAPPED_COLORS, np.float32) / 255.0     # (40, 3)

    segs, rgbs = [], []
    for i in range(num_rooms):
        batch = build_graphs(
            jax.random.PRNGKey(i),
            jnp.asarray(arrays["objs"][i:i + 1]),
            jnp.asarray(arrays["boxes"][i:i + 1]),
            jnp.asarray(arrays["angles"][i:i + 1]),
            jnp.asarray(arrays["obj_mask"][i:i + 1]),
            jnp.asarray(arrays["room_ids"][i:i + 1]), size_info,
            max_on_rels=cfg.data.max_on_rels)
        ch = np.asarray(gan_shade.render_scene_channels(
            batch, bank_host, bank, rcfg))
        seg = gan_shade.layout_channels_to_spade_input(ch)
        # deterministic shading target: class color x depth-based shade
        masks = seg[..., 1:]                                   # (H, W, 40)
        rgb = masks @ colors                                   # (H, W, 3)
        shade = 1.0 - 0.35 * (seg[..., 0] * 0.5 + 0.5)
        rgb = np.clip(rgb * shade[..., None], 0, 1) * 2.0 - 1.0
        segs.append(seg)
        rgbs.append(rgb.astype(np.float32))
    return np.stack(segs), np.stack(rgbs)


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
    p.add_argument("--output_dir", default="./checkpoints_spade")
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
    print(f"| dataset: {segs.shape} -> {rgbs.shape}")

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
        step = make_mmd_gan_train_step(gen, disc, enc, g_tx, d_tx, e_tx)
    else:
        state = GanState(
            g_params=g_vars["params"], d_params=d_vars["params"],
            d_spectral=d_vars.get("spectral", {}),
            g_opt=g_tx.init(g_vars["params"]),
            d_opt=d_tx.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32))
        step = make_gan_train_step(gen, disc, g_tx, d_tx)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(2)
    for t in range(1, args.steps + 1):
        idx = rng.integers(0, len(segs), B)
        z = jax.random.normal(jax.random.fold_in(key, t), (B, args.nz))
        state, losses = step(state, jnp.asarray(segs[idx]),
                             jnp.asarray(rgbs[idx]), z)
        if t % args.print_every == 0:
            print(f"step {t}: " + " ".join(
                f"{k[0]}={float(v):.4f}" for k, v in sorted(losses.items())))

    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "spade_gan.ckpt")
    payload = {
        "g_params": jax.tree.map(np.asarray, state.g_params),
        "d_params": jax.tree.map(np.asarray, state.d_params),
        "config": vars(args)}
    if args.mmd:
        payload["e_params"] = jax.tree.map(np.asarray, state.e_params)
    with open(out, "wb") as f:
        pickle.dump(payload, f)
    print("saved", out)


if __name__ == "__main__":
    main()
