"""SPADE training components: discriminators, GAN losses, one GAN step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sln_tpu.spade.discriminator import (ConvEncoder,
                                         MultiscaleDiscriminator,
                                         NLayerDiscriminator)
from sln_tpu.spade.generator import SPADEGenerator4
from sln_tpu.spade.losses import (GanState, feature_matching_loss, gan_loss,
                                  make_gan_train_step)


def test_discriminator_shapes():
    d = MultiscaleDiscriminator(ndf=8, n_layers=3, num_d=2)
    x = jnp.zeros((2, 64, 64, 44))
    variables = d.init(jax.random.PRNGKey(0), x, False)
    outs = d.apply(variables, x, False)
    assert len(outs) == 2
    # each subsequent discriminator is one layer shallower (reference :419)
    assert len(outs[0]) == 4 and len(outs[1]) == 3
    assert outs[0][-1].shape[0] == 2
    # second discriminator sees the avg-pooled (half-size) image
    assert outs[1][0].shape[1] < outs[0][0].shape[1]


def test_conv_encoder_shapes():
    e = ConvEncoder(nef=8, output_nc=32)
    x = jnp.zeros((2, 64, 64, 3))
    variables = e.init(jax.random.PRNGKey(0), x, False)
    mu, logvar = e.apply(variables, x, False)
    assert mu.shape == (2, 32) and logvar.shape == (2, 32)


def test_gan_loss_modes():
    fake = [[jnp.zeros((1, 4, 4, 1))], [jnp.ones((1, 2, 2, 1))]]
    for mode in ("hinge", "ls", "original", "w"):
        for tgt in (True, False):
            for for_d in (True, False):
                if mode == "hinge" and not for_d and not tgt:
                    continue  # generator hinge loss is real-only
                v = gan_loss(fake, tgt, for_d, mode)
                assert np.isfinite(float(v))


def test_gan_train_step_runs_and_learns():
    gen = SPADEGenerator4(ngf=8, nz=8, crop_size=32)
    disc = MultiscaleDiscriminator(ndf=4, n_layers=2, num_d=2)
    seg = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 32, 32, 41)).astype(np.float32))
    real = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (2, 32, 32, 3)).astype(np.float32))
    z = jax.random.normal(jax.random.PRNGKey(7), (2, 8))

    g_vars = gen.init(jax.random.PRNGKey(0), seg, z)
    d_vars = disc.init(jax.random.PRNGKey(1),
                       jnp.concatenate([seg, real], -1), False)
    g_tx, d_tx = optax.adam(2e-4), optax.adam(2e-4)
    state = GanState(
        g_params=g_vars["params"], d_params=d_vars["params"],
        d_spectral=d_vars.get("spectral", {}),
        g_opt=g_tx.init(g_vars["params"]),
        d_opt=d_tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32))
    step = make_gan_train_step(gen, disc, g_tx, d_tx)

    losses = []
    for i in range(4):
        state, l = step(state, seg, real, z)
        losses.append({k: float(v) for k, v in l.items()})
    assert all(np.isfinite(v) for l in losses for v in l.values())
    assert int(state.step) == 4
    # d_loss should move (params updating)
    assert losses[0]["d_loss"] != losses[-1]["d_loss"]


def test_mmd_rbf_properties():
    from sln_tpu.spade.losses import mmd_rbf
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    same = float(mmd_rbf(x, x))
    near = float(mmd_rbf(x, y))
    far = float(mmd_rbf(x, y + 3.0))
    assert abs(same) < 1e-5
    assert far > near > 0 - 1e-4
    assert far > 0.1


def test_mmd_gan_train_step_runs():
    """Smoke-train the full MMD mode: G + MMD discriminator (decide/z_out
    heads) + ConvEncoderPSPSEMMD with reconstruction and MMD-to-prior."""
    from sln_tpu.spade.encoders import ConvEncoderPSPSEMMD
    from sln_tpu.spade.losses import MmdGanState, make_mmd_gan_train_step

    nz = 8
    gen = SPADEGenerator4(ngf=8, nz=nz, crop_size=32)
    disc = MultiscaleDiscriminator(ndf=4, n_layers=2, num_d=2, mmd_nz=nz)
    enc = ConvEncoderPSPSEMMD(nef=2, output_nc=nz)
    seg = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 32, 32, 41)).astype(np.float32))
    real = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (2, 32, 32, 3)).astype(np.float32))
    z = jax.random.normal(jax.random.PRNGKey(7), (2, nz))

    g_vars = gen.init(jax.random.PRNGKey(0), seg, z)
    d_vars = disc.init(jax.random.PRNGKey(1),
                       jnp.concatenate([seg, real], -1), False)
    e_vars = enc.init(jax.random.PRNGKey(2), real, False)
    g_tx, d_tx, e_tx = optax.adam(2e-4), optax.adam(2e-4), optax.adam(2e-4)
    state = MmdGanState(
        g_params=g_vars["params"], d_params=d_vars["params"],
        d_spectral=d_vars.get("spectral", {}),
        e_params=e_vars["params"], e_spectral=e_vars.get("spectral", {}),
        g_opt=g_tx.init(g_vars["params"]),
        d_opt=d_tx.init(d_vars["params"]),
        e_opt=e_tx.init(e_vars["params"]),
        step=jnp.zeros((), jnp.int32))
    step = make_mmd_gan_train_step(gen, disc, enc, g_tx, d_tx, e_tx)

    losses = []
    for i in range(3):
        state, l = step(state, seg, real, z)
        losses.append({k: float(v) for k, v in l.items()})
    assert all(np.isfinite(v) for l in losses for v in l.values())
    assert {"d_loss", "g_loss", "e_loss"} <= set(losses[0])
    assert losses[0]["e_loss"] != losses[-1]["e_loss"]


def test_train_spade_cli_roundtrip_and_resume(tmp_path):
    """tools/train_spade.py end-to-end at toy size: trains from a pairs
    dir, writes the full checkpoint + fp16 serving artifact with val
    metrics, and --resume warm-starts from the artifact (trained_steps
    accumulates; generator params actually carry over)."""
    import pickle
    import sys

    sys.path.insert(0, ".")
    from tools.train_spade import main

    rng = np.random.default_rng(0)
    pairs = tmp_path / "pairs"
    pairs.mkdir()
    for i in range(4):
        np.savez(pairs / f"{i}.npz",
                 seg=rng.uniform(0, 1, (32, 32, 41)).astype(np.float32),
                 rgb=rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32))

    out = tmp_path / "ckpt"
    art = tmp_path / "art.ckpt"
    base = ["--pairs_dir", str(pairs), "--crop", "32", "--ngf", "4",
            "--ndf", "4", "--nz", "8", "--batch_size", "2", "--steps", "2",
            "--eval_every", "1", "--val_frac", "0.25",
            "--output_dir", str(out), "--artifact", str(art)]
    main(base)

    with open(art, "rb") as f:
        slim = pickle.load(f)
    assert "d_params" not in slim                   # serving-only artifact
    leaves = jax.tree.leaves(slim["g_params"])
    assert all(l.dtype == np.float16 for l in leaves
               if np.issubdtype(l.dtype, np.floating))
    cfg = slim["config"]
    assert cfg["trained_steps"] == 2
    assert np.isfinite(cfg["val_l1"]) and np.isfinite(cfg["val_psnr"])

    main(base + ["--resume", str(art)])
    with open(art, "rb") as f:
        slim2 = pickle.load(f)
    assert slim2["config"]["trained_steps"] == 4    # 2 warm + 2 new
    # identical dataset + val_frac: the held-out split is the same rooms,
    # so resumed val metrics remain held-out-clean
    assert slim2["config"]["val_heldout_clean"] is True
    assert slim2["config"]["val_split"] == slim["config"]["val_split"]

    # resuming under a DIFFERENT val_frac moves the split boundary: rooms
    # the warm-started generator trained on become "held out", so the
    # checkpoint must be stamped not-clean (and say so)
    base_half = (base[:base.index("0.25")] + ["0.5"]
                 + base[base.index("0.25") + 1:])
    main(base_half + ["--resume", str(art)])
    with open(art, "rb") as f:
        slim3 = pickle.load(f)
    assert slim3["config"]["val_heldout_clean"] is False
    assert slim3["config"]["val_split"]["n_val"] == 2

    # taint persists across resume CHAINS: resuming the dirty checkpoint
    # with a NOW-matching split must stay dirty (the warm-started params
    # trained on rooms inside the current val set earlier in the chain)
    main(base_half + ["--resume", str(art)])
    with open(art, "rb") as f:
        slim4 = pickle.load(f)
    assert slim4["config"]["val_split"] == slim3["config"]["val_split"]
    assert slim4["config"]["val_heldout_clean"] is False

    # metadata-only churn (rsync/git-checkout style mtime bumps with
    # identical bytes) must NOT change the split identity or taint
    import os
    p0 = pairs / "0.npz"
    os.utime(p0, (os.path.getatime(p0), os.path.getmtime(p0) + 10))
    main(base_half + ["--resume", str(art)])
    with open(art, "rb") as f:
        slim5 = pickle.load(f)
    assert (slim5["config"]["val_split"]["source"]
            == slim4["config"]["val_split"]["source"])

    # the split identity hashes file CONTENTS: rewriting a pair file in
    # place changes the source even when size AND mtime are preserved
    st = os.stat(p0)
    np.savez(p0, seg=rng.uniform(0, 1, (32, 32, 41)).astype(np.float32),
             rgb=rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32))
    os.utime(p0, (st.st_atime, st.st_mtime))
    main(base_half + ["--resume", str(art)])
    with open(art, "rb") as f:
        slim6 = pickle.load(f)
    assert (slim6["config"]["val_split"]["source"]
            != slim5["config"]["val_split"]["source"])
    assert slim6["config"]["val_heldout_clean"] is False
