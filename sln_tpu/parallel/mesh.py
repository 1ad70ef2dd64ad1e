"""Device mesh + sharding helpers.

The reference is strictly single-GPU (build_dataset_model.py:54-55 asserts
against multi-GPU; SURVEY §2.10). Here data parallelism is first-class:
scenes are independent, so the batch axis shards cleanly over a ('data',
'model') mesh; XLA's SPMD partitioner inserts the ICI collectives (grad
psums, masked-BN stat sums) automatically under jit.

The 'model' axis is available for tensor-parallel sharding of the MLP
hidden dimension (gconv_hidden weights) when the model is scaled up; at the
reference's ~4M params it is typically 1.

Scaling past one slice: `make_multislice_mesh` builds the hybrid
('slice', 'data', 'model') mesh where 'slice' is the DCN dimension —
data parallelism spans slices (hierarchical ICI-then-DCN gradient
reduce), tensor parallelism never leaves a slice. Everything downstream
is topology-agnostic: `batch_sharding`/`shard_batch` shard the batch
axis over whatever data axes the mesh has (`data_axes`), and the train
step itself is plain jit — XLA's SPMD partitioner picks the collectives
from the mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SLICE_AXIS = "slice"


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = devices.size // num_model
    assert num_data * num_model <= devices.size, (
        f"mesh {num_data}x{num_model} > {devices.size} devices")
    grid = devices[: num_data * num_model].reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(num_slices: int,
                         data_per_slice: Optional[int] = None,
                         num_model: int = 1, devices=None) -> Mesh:
    """Hybrid DCN x ICI mesh for multi-slice TPU pods.

    Axis order is ('slice', 'data', 'model') with 'slice' OUTERMOST. The
    batch axis shards over (SLICE_AXIS, DATA_AXIS) jointly
    (`batch_sharding`), so the only collective that crosses the slice
    boundary is the gradient/BN-stat reduction over the batch axes — XLA
    lowers it hierarchically (reduce within each slice over ICI, then one
    small cross-slice sum over DCN, the scaling-book multi-slice DP
    recipe) — while the tensor-parallel 'model' collectives (the per-layer
    row-parallel reduces, which are latency-sensitive) stay strictly
    inside a slice because 'model' is innermost.

    On real multi-slice hardware jax devices carry a `slice_index`;
    devices are grouped by it so each mesh plane [s, :, :] holds exactly
    one slice's chips (delegating to mesh_utils.create_hybrid_device_mesh
    when the requested mesh uses every device, which also orders chips
    within a slice for ICI bandwidth). Requesting more slices than the
    devices actually span is an ERROR, never silently simulated — a
    contiguous fallback could put a DCN hop inside the 'model' axis. On
    single-real-slice or virtual-CPU backends (the driver dryrun)
    contiguous grouping simulates the topology — sharding-equivalent,
    merely bandwidth-oblivious (no DCN boundary exists to misalign with).
    """
    devices = list(devices if devices is not None else jax.devices())
    if data_per_slice is None:
        data_per_slice = len(devices) // (num_slices * num_model)
    per_slice = data_per_slice * num_model
    need = num_slices * per_slice
    # user-facing topology validation raises ValueError (asserts are
    # stripped under python -O, surfacing as an opaque reshape error)
    if not 0 < need <= len(devices):
        raise ValueError(f"mesh {num_slices}x{data_per_slice}x{num_model}"
                         f" > {len(devices)} devices")

    groups: dict = {}
    for d in devices:
        groups.setdefault(getattr(d, "slice_index", None), []).append(d)
    if None in groups and len(groups) > 1:
        # A mix of devices with and without slice_index: neither the
        # strict real-multi-slice branch nor the contiguous simulation
        # is safe — refuse rather than silently simulating around real
        # slice boundaries.
        raise ValueError(
            "device list mixes slice-indexed and sliceless devices "
            f"(slice_index values {sorted(groups, key=repr)}); pass a "
            "homogeneous device list")
    if None not in groups and len(groups) > 1:
        # Devices genuinely span multiple real slices: the topology
        # contract is STRICT — never simulate here, a contiguous
        # fallback could let 'model' (TP, latency-sensitive) span a DCN
        # boundary silently.
        if len(groups) < num_slices:
            raise ValueError(
                f"requested {num_slices} slices but the devices span "
                f"only {len(groups)} (slice_index values "
                f"{sorted(groups)})")
        if (len(groups) == num_slices
                and all(len(g) == per_slice for g in groups.values())):
            # exact fit: delegate to mesh_utils, which additionally
            # orders devices within each slice for ICI bandwidth
            from jax.experimental import mesh_utils
            grid = mesh_utils.create_hybrid_device_mesh(
                (1, data_per_slice, num_model), (num_slices, 1, 1),
                devices=devices)
        else:
            # subset of each slice (mesh_utils requires exact division)
            ordered = []
            for s in sorted(groups)[:num_slices]:
                if len(groups[s]) < per_slice:
                    raise ValueError(
                        f"slice {s} has {len(groups[s])} devices, "
                        f"need {per_slice}")
                ordered.extend(groups[s][:per_slice])
            grid = np.asarray(ordered).reshape(
                num_slices, data_per_slice, num_model)
    else:
        # single real slice or virtual CPU: contiguous simulation is
        # harmless (no DCN boundary exists to misalign with)
        grid = np.asarray(devices[:need]).reshape(
            num_slices, data_per_slice, num_model)
    return Mesh(grid, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))


def data_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch dimension shards over: ('slice', 'data')
    on a multi-slice mesh, ('data',) otherwise."""
    return tuple(a for a in (SLICE_AXIS, DATA_AXIS)
                 if a in mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every array over the data axis
    (jointly over slice+data on a multi-slice mesh)."""
    return NamedSharding(mesh, P(data_axes(mesh)))


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
