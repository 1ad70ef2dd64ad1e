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


class GanState(NamedTuple):
    g_params: Any
    d_params: Any
    d_spectral: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def make_gan_train_step(generator, discriminator, g_tx, d_tx,
                        gan_mode: str = "hinge", lambda_feat: float = 10.0):
    """Jitted alternating G/D step. Batch: (seg (B,H,W,41), real (B,H,W,3),
    z (B,nz))."""

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
            return loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GanState(g_params=g_params, d_params=d_params,
                             d_spectral=new_spectral, g_opt=g_opt,
                             d_opt=d_opt, step=state.step + 1)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    return train_step
