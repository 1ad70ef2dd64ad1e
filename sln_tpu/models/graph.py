"""Graph triple-convolution message passing, TPU-first.

Functional re-design of the reference's GraphTripleConv / GraphTripleConvNet
(reference: models/graph.py:36-143). Differences in *mechanism*, parity in
*math*:

* Batches are (B, O, D) node / (B, T, D) edge tensors with boolean validity
  masks instead of one ragged graph; edges carry per-scene local indices.
* The edge gather and the avg scatter pooling (reference graph.py:78-108)
  are batched one-hot matmuls (see sln_tpu.ops.graphops) — no scatters.
* MLPs run over the flattened (B*T) / (B*O) row axis so the masked
  BatchNorm statistics cover the whole batch exactly like the reference's
  BatchNorm1d over the ragged row axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sln_tpu.models.layers import MLP
from sln_tpu.ops import graphops


def _flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])


class GraphTripleConv(nn.Module):
    """One round of (subject, predicate, object) message passing.

    Math mirrors reference models/graph.py:57-111: concat (s, p, o) -> net1
    -> split into (new_s, new_p, new_o); avg-pool new_s/new_o into nodes with
    counts clamped to >= 1; node MLP net2.
    """

    input_dim: int
    hidden_dim: int
    output_dim: Optional[int] = None
    mlp_normalization: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obj_vecs: jnp.ndarray, pred_vecs: jnp.ndarray,
                 edges: jnp.ndarray, obj_mask: jnp.ndarray,
                 triple_mask: jnp.ndarray, train: bool
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        Args:
          obj_vecs:    (B, O, Din) node features.
          pred_vecs:   (B, T, Din) edge (predicate) features.
          edges:       (B, T, 2) int local [subject, object] node indices.
          obj_mask:    (B, O) bool.
          triple_mask: (B, T) bool.
        Returns:
          (new_obj_vecs (B, O, Dout), new_pred_vecs (B, T, Dout))
        """
        B, O, Din = obj_vecs.shape
        T = pred_vecs.shape[1]
        H = self.hidden_dim
        Dout = self.output_dim or self.input_dim
        dtype = obj_vecs.dtype

        s_oh = graphops.edge_one_hot(edges[..., 0], O, triple_mask, dtype)
        o_oh = graphops.edge_one_hot(edges[..., 1], O, triple_mask, dtype)

        cur_s = graphops.gather_nodes(s_oh, obj_vecs)          # (B, T, Din)
        cur_o = graphops.gather_nodes(o_oh, obj_vecs)
        t_in = jnp.concatenate([cur_s, pred_vecs, cur_o], axis=-1)

        net1 = MLP((3 * Din, H, 2 * H + Dout),
                   batch_norm=self.mlp_normalization, dtype=self.dtype,
                   name="net1")
        t_out = net1(_flat(t_in), _flat(triple_mask), train)
        t_out = t_out.reshape(B, T, 2 * H + Dout)

        new_s = t_out[..., :H]
        new_p = t_out[..., H:H + Dout]
        new_o = t_out[..., H + Dout:]

        pooled = graphops.avg_pool_edges(None, s_oh, o_oh, new_s, new_o)

        net2 = MLP((H, H, Dout), batch_norm=self.mlp_normalization,
                   dtype=self.dtype, name="net2")
        new_obj = net2(_flat(pooled), _flat(obj_mask), train)
        new_obj = new_obj.reshape(B, O, Dout)
        return new_obj, new_p


class GraphTripleConvNet(nn.Module):
    """Stack of GraphTripleConv layers (reference: models/graph.py:114-143)."""

    input_dim: int
    hidden_dim: int
    num_layers: int = 5
    mode: str = "feedforward"          # 'feedforward' | 'recurrent'
    mlp_normalization: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, obj_mask, triple_mask,
                 train: bool):
        if self.mode == "recurrent":
            shared = GraphTripleConv(
                input_dim=self.input_dim, hidden_dim=self.hidden_dim,
                mlp_normalization=self.mlp_normalization, dtype=self.dtype,
                name="gconv_shared")
            for _ in range(self.num_layers):
                obj_vecs, pred_vecs = shared(
                    obj_vecs, pred_vecs, edges, obj_mask, triple_mask, train)
        elif self.mode == "feedforward":
            for i in range(self.num_layers):
                obj_vecs, pred_vecs = GraphTripleConv(
                    input_dim=self.input_dim, hidden_dim=self.hidden_dim,
                    mlp_normalization=self.mlp_normalization,
                    dtype=self.dtype, name=f"gconv_{i}")(
                    obj_vecs, pred_vecs, edges, obj_mask, triple_mask, train)
        else:
            raise ValueError(f"Invalid mode {self.mode!r}")
        return obj_vecs, pred_vecs
