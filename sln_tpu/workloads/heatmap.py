"""Heatmap workload: mass-sample layouts for a word-level scene graph.

The reference runs 20,000 sequential decoder calls on one 6-node graph
(testing/test_heatmap.py:10-64) — the throughput benchmark target. Here the
trials are a batch axis: one jitted program decodes thousands of identical
graphs with independent z ~ N(mean, cov) draws per call.

Artifacts keep the reference layout: `<idx>_heat.pkl` holding
[objs, attributes, boxes, ag_list] and plasma heatmap PNGs. One
documented deviation: `boxes` is a single (num_iter, n, 6) ndarray where
the reference pickles a list of per-trial lists of (6,) arrays
(test_heatmap.py:62-64) — indexing (`heat[2][trial][obj]`) is unchanged,
but consumers relying on list mutation or JSON-serializability of the
pkl need np.asarray semantics.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Sequence, Tuple

import numpy as np

from sln_tpu.data.batch import SceneBatch, make_scene_batch
from sln_tpu.data.vocab import OBJECT_IDX_TO_NAME, PRED_IDX_TO_NAME

DEFAULT_OBJECTS = ["bed", "desk", "cabinet", "chair", "lamp"]
DEFAULT_RELATIONS = [("bed", "behind", "desk"),
                     ("cabinet", "left of", "bed"),
                     ("chair", "left of", "desk"),
                     ("lamp", "on", "desk")]


def sg_from_words(objs_in_scene: Sequence[str],
                  rels_in_scene: Sequence[Tuple[str, str, str]]
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Word-level scene graph -> (objs, triples, attributes) arrays.

    Mirrors testing/test_utils.py:43-90 (incl. the 'name:index' syntax for
    duplicate classes and the appended __room__ node + __in_room__ edges).
    """
    objs = []
    for name in objs_in_scene:
        base = name.split(":")[0] if ":" in name else name
        objs.append(OBJECT_IDX_TO_NAME.index(base))
    triples = []
    for s_name, rel, o_name in rels_in_scene:
        triples.append([list(objs_in_scene).index(s_name),
                        PRED_IDX_TO_NAME.index(rel),
                        list(objs_in_scene).index(o_name)])
    n = len(objs_in_scene)
    for i in range(n):
        triples.append([i, 0, n])
    objs.append(0)  # __room__
    attrs = np.zeros(len(objs), np.int64)
    return (np.array(objs, np.int64), np.array(triples, np.int64), attrs)


def heatmap_scene_batch(batch_size: int, max_objects: int, max_triples: int,
                        objects: Sequence[str] = tuple(DEFAULT_OBJECTS),
                        relations=tuple(DEFAULT_RELATIONS)) -> SceneBatch:
    """Tile the word scene graph into a padded batch of identical scenes."""
    objs, triples, attrs = sg_from_words(list(objects), list(relations))
    n, t = len(objs), len(triples)
    assert n <= max_objects and t <= max_triples
    B = batch_size
    objs_p = np.zeros((B, max_objects), np.int32)
    boxes_p = np.zeros((B, max_objects, 6), np.float32)
    angles_p = np.zeros((B, max_objects), np.int32)
    attrs_p = np.zeros((B, max_objects), np.int32)
    mask_p = np.zeros((B, max_objects), bool)
    triples_p = np.zeros((B, max_triples, 3), np.int32)
    tmask_p = np.zeros((B, max_triples), bool)
    objs_p[:, :n] = objs
    attrs_p[:, :n] = attrs
    mask_p[:, :n] = True
    triples_p[:, :t] = triples
    tmask_p[:, :t] = True
    return make_scene_batch(objs_p, boxes_p, angles_p, attrs_p, mask_p,
                            triples_p, tmask_p)


def make_sampler(model, variables, batch: SceneBatch,
                 mean: np.ndarray, cov: np.ndarray, mesh=None):
    """Jitted: key -> (boxes (B, O, 6), angles (B, O)) with z ~ N(mean, cov).

    Replaces the reference's host-side np.random.multivariate_normal +
    per-trial decoder call (test_heatmap.py:56-62) with on-device Cholesky
    sampling + one batched decode.

    mesh: optional jax.sharding.Mesh for multi-chip serving — the batch
    axis shards over the 'data' mesh axis (scenes are independent), the
    model weights replicate, and XLA partitions the decode; outputs keep
    the same values as the single-device program (PRNG draws depend only
    on key and shape).
    """
    import jax
    import jax.numpy as jnp

    from sln_tpu.models.vae import Sg2ScVAE

    chol = jnp.asarray(np.linalg.cholesky(
        cov + 1e-8 * np.eye(cov.shape[0])), jnp.float32)
    mean_j = jnp.asarray(mean, jnp.float32)
    if mesh is not None:
        from sln_tpu.parallel import mesh as meshlib
        batch = meshlib.shard_batch(batch, mesh)
        variables = meshlib.replicate(variables, mesh)
        chol = jax.device_put(chol, meshlib.replicated(mesh))
        mean_j = jax.device_put(mean_j, meshlib.replicated(mesh))
    B, O = batch.objs.shape

    def sample(key):
        eps = jax.random.normal(key, (B, O, mean_j.shape[0]), jnp.float32)
        z = mean_j + jnp.einsum("bol,kl->bok", eps, chol)
        boxes, angle_lp = model.apply(variables, z, batch, False,
                                      method=Sg2ScVAE.decode)
        return boxes, jnp.argmax(angle_lp, axis=-1)

    if mesh is not None:
        # pin outputs batch-sharded so the partitioner keeps the decode
        # distributed instead of gathering to one device
        from sln_tpu.parallel import mesh as meshlib
        sh = meshlib.batch_sharding(mesh)
        return jax.jit(sample, out_shardings=(sh, sh))
    return jax.jit(sample)


def produce_heatmap(model, variables, mean, cov, test_dir: str,
                    objects=tuple(DEFAULT_OBJECTS),
                    relations=tuple(DEFAULT_RELATIONS),
                    num_iter: int = 20000, batch_size: int = 4096,
                    room_idx: int = 0, max_objects: int = 8,
                    max_triples: int = 24) -> str:
    """Run the sampling workload and write `<idx>_heat.pkl` (reference
    format: test_heatmap.py:63-64)."""
    import jax

    heat_dir = os.path.join(test_dir, "data", "heat")
    os.makedirs(heat_dir, exist_ok=True)

    batch = heatmap_scene_batch(batch_size, max_objects, max_triples,
                                objects, relations)
    sample_fn = make_sampler(model, variables, batch, mean, cov)
    n_valid = int(np.asarray(batch.obj_mask[0]).sum())

    all_boxes: List[np.ndarray] = []
    key = jax.random.PRNGKey(0)
    done = 0
    while done < num_iter:
        boxes, _ = sample_fn(jax.random.fold_in(key, done))
        take = min(batch_size, num_iter - done)
        all_boxes.append(np.asarray(boxes[:take, :n_valid]))
        done += take
    boxes_np = np.concatenate(all_boxes, axis=0)      # (num_iter, n, 6)

    objs_arr, _, attrs_arr = sg_from_words(list(objects), list(relations))
    # the reference pickles a list-of-lists of (6,) arrays
    # (test_heatmap.py:62-64); the (num_iter, n, 6) ndarray is
    # indexing-compatible (heat[2][k][i] -> (6,) array) without
    # materializing O(num_iter*n) Python objects on the host
    path = os.path.join(heat_dir, str(room_idx).zfill(4) + "_heat.pkl")
    with open(path, "wb") as f:
        pickle.dump([objs_arr, attrs_arr, boxes_np, []], f)
    return path


def plot_heatmap(heat_pkl_path: str, save_dir: str,
                 clip_coor: bool = True) -> List[str]:
    """100x100 occupancy histograms of box centers -> plasma PNGs.

    Vectorized port of testing/test_heatmap.py:66-102 (same normalization:
    each trial's boxes are scaled by that trial's *predicted* room box).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(heat_pkl_path, "rb") as f:
        heat = pickle.load(f)
    idx = os.path.basename(heat_pkl_path).split("_")[0]
    boxes = np.asarray(heat[2])                      # (trials, n, 6)
    size = 100
    os.makedirs(save_dir, exist_ok=True)

    room = boxes[:, -1]                               # (trials, 6)
    dims = room[:, 3:] - room[:, :3]                  # (trials, 3)
    scale = np.concatenate([dims, dims], axis=-1)[:, None, :]
    scaled = boxes * scale
    centers = (scaled[..., :3] + scaled[..., 3:]) * 0.5   # (trials, n, 3)

    out_paths = []
    for obj_type in range(boxes.shape[1] - 1):
        ct = centers[:, obj_type]
        if clip_coor:
            ct = np.clip(ct, 0.0, 1.0)
            keep = np.ones(len(ct), bool)
        else:
            keep = np.all((ct > 0) & (ct < 1), axis=-1)
        rd = np.floor(ct[keep] * (size - 1)).astype(int)
        container = np.zeros((size, size))
        np.add.at(container, (rd[:, 2], rd[:, 0]), 1.0)
        container = container / max(container.sum(), 1.0)
        plt.imshow(container, cmap="plasma")
        plt.tight_layout()
        plt.gca().axes.get_yaxis().set_visible(False)
        plt.gca().axes.get_xaxis().set_visible(False)
        path = os.path.join(save_dir,
                            f"{idx}_{str(obj_type).zfill(2)}.png")
        plt.savefig(path)
        plt.close()
        out_paths.append(path)
    return out_paths
