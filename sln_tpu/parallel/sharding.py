"""Parameter partition rules: Megatron-style tensor parallelism for the MLPs.

Every MLP in the model is a 2-layer stack (models/layers.MLP): dense_0
(d_in -> hidden) then dense_1 (hidden -> d_out). Column-parallel dense_0 /
row-parallel dense_1 shards the big gconv_hidden activations over the
'model' mesh axis; XLA inserts the reduce at dense_1 automatically under
jit. Embeddings and 1-layer heads are replicated — they are tiny.

The reference has no model parallelism at all (SURVEY §2.10); this exists
so the same train step scales past one chip when the model is widened.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sln_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    if "dense_0" in names and names[-1] == "kernel" and leaf.ndim == 2:
        return P(None, MODEL_AXIS)          # column parallel
    if "dense_0" in names and names[-1] == "bias":
        return P(MODEL_AXIS)
    if "bn_0" in names:                      # stats/scale on the hidden dim
        return P(MODEL_AXIS)
    if "dense_1" in names and names[-1] == "kernel" and leaf.ndim == 2:
        return P(MODEL_AXIS, None)          # row parallel
    return P()


def partition_specs(params: Any):
    """PartitionSpec pytree matching `params`."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params(params: Any, mesh: Mesh):
    """Place params on the mesh according to the TP rules."""
    specs = partition_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
