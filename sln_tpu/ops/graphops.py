"""Scatter-free batched graph primitives.

The reference pools triple messages into nodes with `scatter_add` over one
ragged graph (reference: models/graph.py:93-108). On TPU, dynamic scatters
serialize; instead every scene is a fixed-size padded graph and both the
edge gather and the node pooling are expressed as batched one-hot matmuls
that run on the MXU:

    gather:  (B, T, O) @ (B, O, D) -> (B, T, D)
    pool:    (B, O, T) @ (B, T, D) -> (B, O, D)

The one-hot tensors are tiny ((B, T, O) ~ a few MB) and XLA fuses the
masking multiplications into the matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def edge_one_hot(idx: jnp.ndarray, num_nodes: int,
                 mask: jnp.ndarray | None = None,
                 dtype=jnp.float32) -> jnp.ndarray:
    """One-hot of (B, T) local node indices -> (B, T, O), zeroed where masked."""
    oh = jax.nn.one_hot(idx, num_nodes, dtype=dtype)
    if mask is not None:
        oh = oh * mask[..., None].astype(dtype)
    return oh


def gather_nodes(one_hot: jnp.ndarray, node_vecs: jnp.ndarray) -> jnp.ndarray:
    """(B, T, O) x (B, O, D) -> (B, T, D): per-edge endpoint features."""
    return jnp.einsum("bto,bod->btd", one_hot, node_vecs,
                      preferred_element_type=node_vecs.dtype)


def pool_messages(one_hot: jnp.ndarray, messages: jnp.ndarray) -> jnp.ndarray:
    """(B, T, O) x (B, T, D) -> (B, O, D): sum edge messages into nodes."""
    return jnp.einsum("bto,btd->bod", one_hot, messages,
                      preferred_element_type=messages.dtype)


def pool_counts(one_hot_s: jnp.ndarray, one_hot_o: jnp.ndarray) -> jnp.ndarray:
    """Number of (masked) edge endpoints touching each node: (B, O)."""
    return one_hot_s.sum(axis=1) + one_hot_o.sum(axis=1)


def avg_pool_edges(obj_vecs_like_shape, one_hot_s, one_hot_o,
                   new_s, new_o):
    """Average-pool subject/object messages into nodes.

    Mirrors the reference's scatter_add + count-clamp avg pooling
    (models/graph.py:93-108): nodes touched by zero edges divide by 1.
    """
    pooled = pool_messages(one_hot_s, new_s) + pool_messages(one_hot_o, new_o)
    counts = pool_counts(one_hot_s, one_hot_o)            # (B, O)
    counts = jnp.clip(counts, 1.0, None)
    return pooled / counts[..., None]
