"""Loss assembly parity with the reference calculate_model_losses
(utils.py:12-33) on identical data."""

import sys
import types

import numpy as np
import jax.numpy as jnp

from sln_tpu.data.batch import make_scene_batch
from sln_tpu.train.losses import vae_losses


def test_losses_match_reference():
    sys.path.insert(0, "/root/reference")
    import torch
    from utils import calculate_model_losses

    rng = np.random.default_rng(0)
    sizes = [4, 7, 5]
    O = 8
    B = len(sizes)
    latent = 64

    boxes = rng.standard_normal((B, O, 6)).astype(np.float32)
    boxes_pred = rng.standard_normal((B, O, 6)).astype(np.float32)
    angles = rng.integers(0, 24, (B, O)).astype(np.int32)
    logits = rng.standard_normal((B, O, 24)).astype(np.float32)
    logprobs = np.asarray(jnp.asarray(logits)
                          - jnp.log(jnp.exp(jnp.asarray(logits)).sum(-1,
                                                                     keepdims=True)))
    mu = rng.standard_normal((B, O, latent)).astype(np.float32)
    logvar = (0.1 * rng.standard_normal((B, O, latent))).astype(np.float32)
    mask = np.zeros((B, O), bool)
    for b, n in enumerate(sizes):
        mask[b, :n] = True

    batch = make_scene_batch(
        np.zeros((B, O), np.int32), boxes, angles,
        np.zeros((B, O), np.int32), mask,
        np.zeros((B, 4, 3), np.int32), np.zeros((B, 4), bool))

    kl_weight = 0.1
    total, losses = vae_losses(batch, jnp.asarray(mu), jnp.asarray(logvar),
                               jnp.asarray(boxes_pred), jnp.asarray(logprobs),
                               kl_weight)

    # reference on flattened valid rows
    def flat(x):
        return torch.from_numpy(
            np.concatenate([x[b, :n] for b, n in enumerate(sizes)]))

    args = types.SimpleNamespace(use_AE=False)
    ref_total, ref_losses = calculate_model_losses(
        args, None, flat(boxes), flat(boxes_pred),
        flat(angles).long(), flat(logprobs), mu=flat(mu),
        logvar=flat(logvar), KL_weight=kl_weight)

    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)
    np.testing.assert_allclose(float(losses["bbox_pred"]),
                               ref_losses["bbox_pred"], rtol=1e-5)
    np.testing.assert_allclose(float(losses["angle_pred"]),
                               ref_losses["angle_pred"], rtol=1e-5)
    np.testing.assert_allclose(float(losses["KLD_Gauss"]),
                               ref_losses["KLD_Gauss"], rtol=1e-5)


def _toy_batch(B=2, O=4, latent=8, seed=0):
    rng = np.random.default_rng(seed)
    mask = np.ones((B, O), bool)
    batch = make_scene_batch(
        np.zeros((B, O), np.int32),
        rng.standard_normal((B, O, 6)).astype(np.float32),
        rng.integers(0, 24, (B, O)).astype(np.int32),
        np.zeros((B, O), np.int32), mask,
        np.zeros((B, 4, 3), np.int32), np.zeros((B, 4), bool))
    logits = rng.standard_normal((B, O, 24)).astype(np.float32)
    logprobs = jnp.asarray(logits) - jnp.log(
        jnp.exp(jnp.asarray(logits)).sum(-1, keepdims=True))
    boxes_pred = jnp.asarray(
        rng.standard_normal((B, O, 6)).astype(np.float32))
    return batch, boxes_pred, logprobs, latent


def test_free_bits_zero_is_parity():
    """kl_free_bits=0 must change nothing vs the reference formula."""
    batch, boxes_pred, logprobs, latent = _toy_batch()
    B, O = batch.obj_mask.shape
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.standard_normal((B, O, latent)).astype(np.float32))
    lv = jnp.asarray(
        (0.3 * rng.standard_normal((B, O, latent))).astype(np.float32))
    t0, l0 = vae_losses(batch, mu, lv, boxes_pred, logprobs, 0.1)
    t1, l1 = vae_losses(batch, mu, lv, boxes_pred, logprobs, 0.1,
                        kl_free_bits=0.0)
    np.testing.assert_allclose(float(t0), float(t1), rtol=1e-7)
    np.testing.assert_allclose(float(l0["KLD_Gauss"]),
                               float(l1["KLD_Gauss"]), rtol=1e-7)


def test_free_bits_floors_collapsed_dims():
    """A collapsed posterior (mu=0, logvar=0 -> KL=0) pays the floor but
    gets NO gradient pushing it further down; an active posterior above
    the floor keeps the exact reference gradient."""
    import jax

    batch, boxes_pred, logprobs, latent = _toy_batch()
    B, O = batch.obj_mask.shape
    fb = 0.05

    def kld(mu, lv, free_bits):
        _, losses = vae_losses(batch, mu, lv, boxes_pred, logprobs, 1.0,
                               kl_free_bits=free_bits)
        return losses["KLD_Gauss"]

    # collapsed: penalty = floor * D, zero grad
    mu0 = jnp.zeros((B, O, latent))
    lv0 = jnp.zeros((B, O, latent))
    val = float(kld(mu0, lv0, fb))
    np.testing.assert_allclose(val, fb * latent, rtol=1e-6)
    g = jax.grad(kld)(mu0, lv0, fb)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-9)

    # active (KL per dim >> floor): same value and grad as free_bits=0
    mu1 = jnp.full((B, O, latent), 2.0)
    np.testing.assert_allclose(float(kld(mu1, lv0, fb)),
                               float(kld(mu1, lv0, 0.0)), rtol=1e-6)
    g1 = jax.grad(kld)(mu1, lv0, fb)
    g0 = jax.grad(kld)(mu1, lv0, 0.0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-6)
