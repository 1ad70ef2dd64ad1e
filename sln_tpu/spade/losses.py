"""GAN losses (reference GANLoss_2, models/SPADE_related.py:509-593) +
feature matching, and a jitted SPADE GAN training step.

The reference repo ships the SPADE GAN inference path only; the training
machinery (discriminators, hinge/ls/original/wgan losses, feature matching)
exists as unused classes. Here it is a working jitted training step so the
shading generator can be (re)trained on TPU from rasterizer outputs.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


def gan_loss(logits: List[List[jnp.ndarray]], target_is_real: bool,
             for_discriminator: bool, mode: str = "hinge") -> jnp.ndarray:
    """Multiscale GAN loss, averaged over discriminators
    (reference :550-593). Each entry's last element is the logit map."""
    total = 0.0
    for feats in logits:
        pred = feats[-1]
        if mode == "original":
            target = jnp.float32(1.0 if target_is_real else 0.0)
            loss = optax.sigmoid_binary_cross_entropy(
                pred, jnp.full_like(pred, target)).mean()
        elif mode in ("ls", "lsgan"):
            target = jnp.float32(1.0 if target_is_real else 0.0)
            loss = jnp.square(pred - target).mean()
        elif mode == "hinge":
            if for_discriminator:
                if target_is_real:
                    loss = -jnp.minimum(pred - 1.0, 0.0).mean()
                else:
                    loss = -jnp.minimum(-pred - 1.0, 0.0).mean()
            else:
                loss = -pred.mean()
        else:  # wgan
            loss = -pred.mean() if target_is_real else pred.mean()
        total = total + loss
    return total / len(logits)


def feature_matching_loss(fake_feats: List[List[jnp.ndarray]],
                          real_feats: List[List[jnp.ndarray]]
                          ) -> jnp.ndarray:
    """pix2pixHD feature matching over intermediate discriminator layers."""
    total = 0.0
    n = 0
    for ff, rf in zip(fake_feats, real_feats):
        for f, r in zip(ff[:-1], rf[:-1]):
            total = total + jnp.abs(f - jax.lax.stop_gradient(r)).mean()
            n += 1
    return total / max(n, 1)


def mmd_rbf(x: jnp.ndarray, y: jnp.ndarray,
            scales=(0.25, 0.5, 1.0, 2.0, 4.0)) -> jnp.ndarray:
    """Multi-scale RBF maximum mean discrepancy between two z batches.

    The alignment objective behind the reference's dead MMD classes
    (ConvEncoder_PSP_SE_MMD + *_MMD discriminators,
    models/SPADE_related.py:909-979,1237-1398): match the encoder's
    aggregate z distribution to the N(0, I) prior without a KL term.
    """
    d = x.shape[-1]

    def k(a, b):
        sq = jnp.sum((a[:, None] - b[None]) ** 2, -1)
        out = 0.0
        for s in scales:
            gamma = 1.0 / (2.0 * s * d)
            out = out + jnp.exp(-gamma * sq)
        return out

    return k(x, x).mean() + k(y, y).mean() - 2.0 * k(x, y).mean()


def split_mmd_output(out: List[list]) -> Tuple[List[list], List[jnp.ndarray]]:
    """Multiscale MMD-discriminator output [feats..., (logits, z)] per
    scale -> (plain [feats..., logits] lists for the GAN/feat losses,
    per-scale z predictions)."""
    plain, zs = [], []
    for feats in out:
        logits, z = feats[-1]
        plain.append(list(feats[:-1]) + [logits])
        zs.append(z)
    return plain, zs


class GanState(NamedTuple):
    g_params: Any
    d_params: Any
    d_spectral: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def make_gan_train_step(generator, discriminator, g_tx, d_tx,
                        gan_mode: str = "hinge", lambda_feat: float = 10.0,
                        lambda_l1: float = 0.0):
    """Jitted alternating G/D step. Batch: (seg (B,H,W,41), real (B,H,W,3),
    z (B,nz)). lambda_l1 adds a direct pixel reconstruction term to G —
    the stand-in for the VGG perceptual loss the reference's SPADE
    training recipe pairs with feature matching (no pretrained VGG in
    this stack)."""

    def d_forward(d_params, d_spectral, img, seg, train):
        x = jnp.concatenate([seg, img], axis=-1)
        out, mut = discriminator.apply(
            {"params": d_params, "spectral": d_spectral}, x, train,
            mutable=["spectral"])
        return out, mut.get("spectral", d_spectral)

    @jax.jit
    def train_step(state: GanState, seg, real, z):
        # --- discriminator
        def d_loss_fn(d_params):
            fake = generator.apply({"params": state.g_params}, seg, z)
            fake = jax.lax.stop_gradient(fake)
            fake_out, sp1 = d_forward(d_params, state.d_spectral, fake,
                                      seg, True)
            real_out, sp2 = d_forward(d_params, sp1, real, seg, True)
            loss = (gan_loss(fake_out, False, True, gan_mode)
                    + gan_loss(real_out, True, True, gan_mode))
            return loss, sp2

        (d_loss, new_spectral), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # --- generator
        def g_loss_fn(g_params):
            fake = generator.apply({"params": g_params}, seg, z)
            fake_out, _ = d_forward(d_params, new_spectral, fake, seg,
                                    False)
            real_out, _ = d_forward(d_params, new_spectral, real, seg,
                                    False)
            loss = (gan_loss(fake_out, True, False, gan_mode)
                    + lambda_feat * feature_matching_loss(fake_out,
                                                          real_out))
            if lambda_l1:
                loss = loss + lambda_l1 * jnp.abs(fake - real).mean()
            return loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GanState(g_params=g_params, d_params=d_params,
                             d_spectral=new_spectral, g_opt=g_opt,
                             d_opt=d_opt, step=state.step + 1)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    return train_step


class MmdGanState(NamedTuple):
    g_params: Any
    d_params: Any
    d_spectral: Any
    e_params: Any
    e_spectral: Any
    g_opt: Any
    d_opt: Any
    e_opt: Any
    step: jnp.ndarray


def make_mmd_gan_train_step(generator, discriminator, encoder, g_tx, d_tx,
                            e_tx, gan_mode: str = "hinge",
                            lambda_feat: float = 10.0,
                            lambda_z: float = 1.0,
                            lambda_mmd: float = 10.0,
                            lambda_rec: float = 10.0,
                            lambda_l1: float = 0.0):
    """Jitted MMD training mode — the objective the reference's unused
    MMD classes imply (SPADE_related.py:909-979 encoders, :1237-1398
    discriminators with decide + z_out heads):

    * D: multiscale hinge on the decide logits, plus z-regression —
      recover the z that generated each fake (InfoGAN-style head).
    * G: adversarial + feature matching + z-recovery through D.
    * E (ConvEncoderPSPSEMMD): reconstruct real images through G from
      the encoded z (L1) while MMD-matching the aggregate z batch to the
      N(0, I) prior — VAE-free z alignment.

    Batch: (seg (B,H,W,41), real (B,H,W,3), z (B,nz) prior samples).
    """

    def d_forward(d_params, d_spectral, img, seg, train):
        x = jnp.concatenate([seg, img], axis=-1)
        out, mut = discriminator.apply(
            {"params": d_params, "spectral": d_spectral}, x, train,
            mutable=["spectral"])
        return out, mut.get("spectral", d_spectral)

    def e_forward(e_params, e_spectral, img, train):
        z, mut = encoder.apply(
            {"params": e_params, "spectral": e_spectral}, img, train,
            mutable=["spectral"])
        return z, mut.get("spectral", e_spectral)

    def z_regression(zs: List[jnp.ndarray], z: jnp.ndarray) -> jnp.ndarray:
        total = 0.0
        for zp in zs:
            total = total + jnp.square(zp - z).mean()
        return total / max(len(zs), 1)

    @jax.jit
    def train_step(state: MmdGanState, seg, real, z):
        # --- discriminator: adversarial + recover z from fakes
        def d_loss_fn(d_params):
            fake = jax.lax.stop_gradient(
                generator.apply({"params": state.g_params}, seg, z))
            fake_out, sp1 = d_forward(d_params, state.d_spectral, fake,
                                      seg, True)
            real_out, sp2 = d_forward(d_params, sp1, real, seg, True)
            fake_plain, fake_z = split_mmd_output(fake_out)
            real_plain, _ = split_mmd_output(real_out)
            loss = (gan_loss(fake_plain, False, True, gan_mode)
                    + gan_loss(real_plain, True, True, gan_mode)
                    + lambda_z * z_regression(fake_z, z))
            return loss, sp2

        (d_loss, new_spectral), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # --- generator: adversarial + feature match + z recoverability
        def g_loss_fn(g_params):
            fake = generator.apply({"params": g_params}, seg, z)
            fake_out, _ = d_forward(d_params, new_spectral, fake, seg,
                                    False)
            real_out, _ = d_forward(d_params, new_spectral, real, seg,
                                    False)
            fake_plain, fake_z = split_mmd_output(fake_out)
            real_plain, _ = split_mmd_output(real_out)
            loss = (gan_loss(fake_plain, True, False, gan_mode)
                    + lambda_feat * feature_matching_loss(fake_plain,
                                                          real_plain)
                    + lambda_z * z_regression(fake_z, z))
            if lambda_l1:
                loss = loss + lambda_l1 * jnp.abs(fake - real).mean()
            return loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # --- encoder: reconstruction through G + MMD(z_enc, prior)
        def e_loss_fn(e_params):
            z_enc, sp = e_forward(e_params, state.e_spectral, real, True)
            recon = generator.apply({"params": g_params}, seg, z_enc)
            loss = (lambda_rec * jnp.abs(recon - real).mean()
                    + lambda_mmd * mmd_rbf(z_enc, z))
            return loss, sp

        (e_loss, new_e_spectral), e_grads = jax.value_and_grad(
            e_loss_fn, has_aux=True)(state.e_params)
        e_updates, e_opt = e_tx.update(e_grads, state.e_opt, state.e_params)
        e_params = optax.apply_updates(state.e_params, e_updates)

        new_state = MmdGanState(
            g_params=g_params, d_params=d_params, d_spectral=new_spectral,
            e_params=e_params, e_spectral=new_e_spectral, g_opt=g_opt,
            d_opt=d_opt, e_opt=e_opt, step=state.step + 1)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss,
                           "e_loss": e_loss}

    return train_step
