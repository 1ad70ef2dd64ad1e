"""Masked VAE loss assembly.

Mirrors the reference `calculate_model_losses` (reference: utils.py:12-33):
L1 on boxes + NLL on angle bins + KL, where every mean/normalizer counts
only valid (non-padding) object rows so the numbers match the reference's
ragged batches exactly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from sln_tpu.data.batch import SceneBatch


def vae_losses(batch: SceneBatch, mu, logvar, boxes_pred, angle_logprobs,
               kl_weight: float, use_ae: bool = False,
               kl_free_bits: float = 0.0
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    m = batch.obj_mask.astype(jnp.float32)              # (B, O)
    n_valid = jnp.maximum(m.sum(), 1.0)

    # F.l1_loss: mean over all elements of valid rows (utils.py:17)
    l1 = jnp.abs(boxes_pred - batch.boxes) * m[..., None]
    loss_bbox = l1.sum() / (n_valid * boxes_pred.shape[-1])

    # F.nll_loss over 24 angle bins (utils.py:20)
    picked = jnp.take_along_axis(angle_logprobs,
                                 batch.angles[..., None], axis=-1)[..., 0]
    loss_angle = -(picked * m).sum() / n_valid

    losses = {"bbox_pred": loss_bbox, "angle_pred": loss_angle}
    total = loss_bbox + loss_angle

    if not use_ae:
        # -0.5 * sum(1 + logvar - mu^2 - e^logvar) / num_objects
        # (utils.py:25; the reference divides by mu.size(0) = object count)
        kl_el = -0.5 * (1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
        kl_per_dim = (kl_el * m[..., None]).sum(
            axis=tuple(range(kl_el.ndim - 1))) / n_valid      # (D,)
        loss_kl = kl_per_dim.sum()
        if kl_free_bits > 0.0:
            # free bits (Kingma et al., IAF 2016): no penalty below the
            # floor per latent dim, so long training can't collapse the
            # posterior to the prior and kill z-space refinement
            # (CLAUDE.md modeling note). kl_free_bits=0 is exact
            # reference parity.
            penalty = jnp.maximum(kl_per_dim, kl_free_bits).sum()
        else:
            penalty = loss_kl
        losses["KLD_Gauss"] = penalty * kl_weight
        losses["KLD_raw"] = loss_kl
        total = total + penalty * kl_weight

    losses["total_loss"] = total
    return total, losses
