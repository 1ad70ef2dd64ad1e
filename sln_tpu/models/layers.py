"""Shared NN building blocks: masked BatchNorm and the reference-style MLP.

The reference's `make_mlp` (reference: models/graph.py:10-27) stacks
Linear -> BatchNorm1d -> ReLU and, with `norelu=True`, strips the trailing
activation (and BatchNorm). Its BatchNorm runs over the ragged
"all objects/triples in the batch" axis; here batches are padded to static
shapes, so BatchNorm computes masked statistics over valid rows only —
numerically identical to the reference on the same data.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch.nn.init.kaiming_normal_ default: gain=sqrt(2), fan_in, normal
# (reference: models/graph.py:30-33).
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid rows of a padded (N, F) activation matrix.

    Matches torch.nn.BatchNorm1d semantics (eps=1e-5, momentum=0.1, biased
    variance for normalization, unbiased for the running-variance update).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if train:
            m = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(m.sum(), 1.0)
            xf = x.astype(jnp.float32)
            # one-pass sum/sumsq (vs mean then E[(x-mean)^2]) so XLA emits a
            # single fused read of x: the two-pass form stops fitting the
            # fused-pipeline VMEM window at large B and re-streams the
            # (B*T, C) activation from HBM (measured 1.4x/scene fwd
            # slowdown at batch 1024, tools/profile_batch_scaling.py).
            # fp32 accumulation; post-Dense activations are O(1), so the
            # E[x^2]-mean^2 cancellation is benign (clamped at 0).
            s1 = (xf * m).sum(axis=0)
            s2 = (jnp.square(xf) * m).sum(axis=0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1.0 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1.0 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class OneHotEmbed(nn.Module):
    """nn.Embed drop-in whose BACKWARD is a matmul, not a scatter.

    A gather's VJP is a scatter-add, which TPUs handle poorly; with
    vocabularies this small (<= 33 entries) the lookup is better
    expressed as one_hot @ table so the cotangent w.r.t. the table is
    one_hot^T @ g on the MXU. Measured neutral on the current train step
    (XLA already handled the tiny scatters well there) — kept because it
    is the scaling-safe formulation. Identical forward values; the
    parameter is named `embedding` with nn.Embed's shape, so checkpoints
    and the torch port are unchanged."""

    num_embeddings: int
    features: int
    embedding_init: nn.initializers.Initializer = nn.initializers.normal(
        stddev=1.0)

    @nn.compact
    def __call__(self, idx: jnp.ndarray) -> jnp.ndarray:
        table = self.param("embedding", self.embedding_init,
                           (self.num_embeddings, self.features))
        oh = jax.nn.one_hot(idx, self.num_embeddings, dtype=table.dtype)
        # HIGHEST precision: a default-precision matmul would round the
        # table through bf16 on TPU, where the gather it replaces was
        # bit-exact; at these vocab sizes the fp32 pass costs nothing
        return jnp.matmul(oh, table, precision=jax.lax.Precision.HIGHEST)


class MLP(nn.Module):
    """Reference `make_mlp` equivalent (models/graph.py:10-27).

    dims = [d_in, d_hidden, ..., d_out]. Each stage is
    Dense -> (BatchNorm) -> ReLU; `final_plain=True` replicates
    `norelu=True` (last stage is Dense only).
    """

    dims: Sequence[int]
    batch_norm: str = "none"          # 'batch' | 'none'
    final_plain: bool = False          # reference `norelu`
    kernel_init: nn.initializers.Initializer = kaiming_normal
    # compute dtype (params stay fp32); bfloat16 halves activation traffic
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        num_stages = len(self.dims) - 1
        for i in range(num_stages):
            x = nn.Dense(self.dims[i + 1], kernel_init=self.kernel_init,
                         dtype=self.dtype, name=f"dense_{i}")(x)
            is_last = i == num_stages - 1
            if is_last and self.final_plain:
                break
            if self.batch_norm == "batch":
                x = MaskedBatchNorm(self.dims[i + 1], name=f"bn_{i}")(
                    x, mask, train)
            x = nn.relu(x)
        return x
