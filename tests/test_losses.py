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
