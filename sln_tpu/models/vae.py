"""Sg2ScVAE: conditional VAE over per-object (box, angle) given a scene graph.

Architecture parity with the reference Sg2ScVAEModel
(reference: models/Sg2ScVAE_model.py:6-188) at the default configuration
(embedding_dim=64, decoder_cat=True, use_attr=True, 5 feedforward gconv
layers, BatchNorm MLPs — build_dataset_model.py:39-53, options/options.py),
re-expressed over static-shape padded batches (sln_tpu.data.batch).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sln_tpu.config import ModelConfig
from sln_tpu.data.batch import SceneBatch
from sln_tpu.models.graph import GraphTripleConvNet
from sln_tpu.models.layers import MLP, OneHotEmbed, kaiming_normal

# Embedding lookups use OneHotEmbed (torch nn.Embedding N(0,1) init, but
# the backward is a matmul instead of a TPU-hostile scatter — layers.py).


def _flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])


class Sg2ScVAE(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        e = c.embedding_dim
        dt = jnp.dtype(c.compute_dtype)
        self._dt = dt
        # Encoder embeddings (reference: Sg2ScVAE_model.py:44-57)
        self.obj_embeddings_ec = OneHotEmbed(c.num_objs + 1,
                                             c.obj_embedding_dim)
        self.pred_embeddings_ec = OneHotEmbed(c.num_preds, 2 * e)
        self.obj_embeddings_dc = OneHotEmbed(c.num_objs + 1,
                                             c.obj_embedding_dim)
        dc_pred_dim = 2 * e if c.decoder_cat else e
        self.pred_embeddings_dc = OneHotEmbed(c.num_preds, dc_pred_dim)
        if c.use_attr:
            self.attr_embedding_ec = OneHotEmbed(c.num_attrs,
                                                 c.attr_embedding_dim)
            self.attr_embedding_dc = OneHotEmbed(c.num_attrs,
                                                 c.attr_embedding_dim)
        self.box_embeddings = nn.Dense(c.box_embedding_dim,
                                       kernel_init=kaiming_normal)
        self.angle_embeddings = OneHotEmbed(c.num_angles,
                                            c.angle_embedding_dim)

        # Posterior heads (reference: Sg2ScVAE_model.py:59-66)
        bn = c.mlp_normalization
        self.box_mean_var = MLP((2 * e, c.gconv_hidden_dim, 2 * e),
                                batch_norm=bn, dtype=dt)
        self.box_mean = MLP((2 * e, c.box_embedding_dim), batch_norm=bn,
                            final_plain=True, dtype=dt)
        self.box_var = MLP((2 * e, c.box_embedding_dim), batch_norm=bn,
                           final_plain=True, dtype=dt)
        self.angle_mean_var = MLP((2 * e, c.gconv_hidden_dim, 2 * e),
                                  batch_norm=bn, dtype=dt)
        self.angle_mean = MLP((2 * e, c.angle_embedding_dim), batch_norm=bn,
                              final_plain=True, dtype=dt)
        self.angle_var = MLP((2 * e, c.angle_embedding_dim), batch_norm=bn,
                             final_plain=True, dtype=dt)

        # Graph conv stacks (reference: Sg2ScVAE_model.py:67-89)
        self.gconv_net_ec = GraphTripleConvNet(
            input_dim=2 * e, hidden_dim=c.gconv_hidden_dim,
            num_layers=c.gconv_num_layers, mode=c.gconv_mode,
            mlp_normalization=bn, dtype=dt)
        dc_input = 2 * e if c.decoder_cat else e
        self.gconv_net_dc = GraphTripleConvNet(
            input_dim=dc_input, hidden_dim=c.gconv_hidden_dim,
            num_layers=c.gconv_num_layers, mode=c.gconv_mode,
            mlp_normalization=bn, dtype=dt)

        # Output heads (reference: Sg2ScVAE_model.py:91-103)
        box_in = 2 * e + (c.attr_embedding_dim if c.use_attr else 0)
        self.box_net = MLP((box_in, c.gconv_hidden_dim, c.box_dim),
                           batch_norm=bn, final_plain=True, dtype=dt)
        self.angle_net = MLP((2 * e, c.gconv_hidden_dim, c.num_angles),
                             batch_norm=bn, final_plain=True, dtype=dt)

    # ------------------------------------------------------------------
    def encode(self, batch: SceneBatch, train: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior q(z | graph, boxes, angles).

        Returns (mu, logvar), each (B, O, latent_dim) with
        latent = [box (48) | angle (16)] at embedding_dim=64.
        Mirrors reference Sg2ScVAE_model.py:115-143.
        """
        c = self.cfg
        obj_vecs = self.obj_embeddings_ec(batch.objs)
        if c.use_attr:
            attr_vecs = self.attr_embedding_ec(batch.attrs)
            obj_vecs = jnp.concatenate([obj_vecs, attr_vecs], axis=-1)
        angle_vecs = self.angle_embeddings(batch.angles)
        pred_vecs = self.pred_embeddings_ec(batch.preds)
        box_vecs = self.box_embeddings(batch.boxes)
        obj_vecs = jnp.concatenate([obj_vecs, box_vecs, angle_vecs], axis=-1)
        obj_vecs = obj_vecs.astype(self._dt)
        pred_vecs = pred_vecs.astype(self._dt)

        obj_vecs, _ = self.gconv_net_ec(
            obj_vecs, pred_vecs, batch.edges, batch.obj_mask,
            batch.triple_mask, train)

        B, O = batch.objs.shape
        flat_mask = _flat(batch.obj_mask)
        flat = _flat(obj_vecs)
        vec_box = self.box_mean_var(flat, flat_mask, train)
        mu_box = self.box_mean(vec_box, flat_mask, train)
        logvar_box = self.box_var(vec_box, flat_mask, train)
        vec_angle = self.angle_mean_var(flat, flat_mask, train)
        mu_angle = self.angle_mean(vec_angle, flat_mask, train)
        logvar_angle = self.angle_var(vec_angle, flat_mask, train)

        mu = jnp.concatenate([mu_box, mu_angle], axis=-1).reshape(B, O, -1)
        logvar = jnp.concatenate([logvar_box, logvar_angle],
                                 axis=-1).reshape(B, O, -1)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)

    # ------------------------------------------------------------------
    def decode(self, z: jnp.ndarray, batch: SceneBatch, train: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """p(box, angle | z, graph). Mirrors reference Sg2ScVAE_model.py:145-172.

        Returns (boxes_pred (B, O, 6), angle_logprobs (B, O, 24)).
        """
        c = self.cfg
        obj_vecs = self.obj_embeddings_dc(batch.objs)
        attr_vecs = None
        if c.use_attr:
            attr_vecs = self.attr_embedding_dc(batch.attrs)
            obj_vecs = jnp.concatenate([obj_vecs, attr_vecs], axis=-1)
        pred_vecs = self.pred_embeddings_dc(batch.preds)

        pred_vecs = pred_vecs.astype(self._dt)
        if c.decoder_cat:
            obj_vecs = jnp.concatenate([obj_vecs, z],
                                       axis=-1).astype(self._dt)
            obj_vecs, _ = self.gconv_net_dc(
                obj_vecs, pred_vecs, batch.edges, batch.obj_mask,
                batch.triple_mask, train)
        else:
            obj_vecs, _ = self.gconv_net_dc(
                obj_vecs.astype(self._dt), pred_vecs, batch.edges,
                batch.obj_mask, batch.triple_mask, train)
            obj_vecs = jnp.concatenate([obj_vecs, z.astype(self._dt)],
                                       axis=-1)

        B, O = batch.objs.shape
        flat_mask = _flat(batch.obj_mask)
        flat = _flat(obj_vecs)
        if c.use_attr:
            box_in = jnp.concatenate([flat, _flat(attr_vecs)], axis=-1)
        else:
            box_in = flat
        boxes_pred = self.box_net(box_in, flat_mask,
                                  train).reshape(B, O, -1)
        angle_logits = self.angle_net(flat, flat_mask, train)
        angle_logprobs = jax.nn.log_softmax(
            angle_logits.astype(jnp.float32), axis=-1).reshape(B, O, -1)
        return boxes_pred.astype(jnp.float32), angle_logprobs

    # ------------------------------------------------------------------
    def __call__(self, batch: SceneBatch, rng: Optional[jax.Array] = None,
                 train: bool = False):
        """Full VAE pass (reference Sg2ScVAE_model.py:174-188)."""
        mu, logvar = self.encode(batch, train)
        if self.cfg.use_ae or rng is None:
            z = mu
        else:
            std = jnp.exp(0.5 * logvar)
            eps = jax.random.normal(rng, std.shape, std.dtype)
            z = mu + eps * std
        boxes_pred, angle_logprobs = self.decode(z, batch, train)
        return mu, logvar, boxes_pred, angle_logprobs


def reparameterize(rng: jax.Array, mu: jnp.ndarray,
                   logvar: jnp.ndarray) -> jnp.ndarray:
    std = jnp.exp(0.5 * logvar)
    return mu + jax.random.normal(rng, std.shape, std.dtype) * std
