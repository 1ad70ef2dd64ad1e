"""Device mesh + sharding helpers.

The reference is strictly single-GPU (build_dataset_model.py:54-55 asserts
against multi-GPU; SURVEY §2.10). Here data parallelism is first-class:
scenes are independent, so the batch axis shards cleanly over a ('data',
'model') mesh; XLA's SPMD partitioner inserts the ICI collectives (grad
psums, masked-BN stat sums) automatically under jit.

The 'model' axis is available for tensor-parallel sharding of the MLP
hidden dimension (gconv_hidden weights) when the model is scaled up; at the
reference's ~4M params it is typically 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = devices.size // num_model
    assert num_data * num_model <= devices.size, (
        f"mesh {num_data}x{num_model} > {devices.size} devices")
    grid = devices[: num_data * num_model].reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every array over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a SceneBatch (or any pytree of arrays with a leading batch
    axis) so the batch axis is split across the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def global_from_host_shards(local_batch, mesh: Mesh,
                            global_batch_size: int):
    """Assemble each host's local batch rows (from
    train.loop.host_sharded_batches) into one global jax.Array whose
    leading axis shards over the data axis.

    Uses jax.make_array_from_process_local_data: each process contributes
    only the rows its addressable devices own — this is the multi-host /
    multi-slice input boundary (DCN never carries training data, only
    each host's own shard moves host->device; the step's gradient psums
    then ride ICI within each slice). Single-process meshes (including
    the virtual-device dryrun) degenerate to a plain sharded device_put
    of the full batch, so the same code path serves both."""
    sh = batch_sharding(mesh)

    def make(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sh, x, (global_batch_size,) + x.shape[1:])

    return jax.tree.map(make, local_batch)
