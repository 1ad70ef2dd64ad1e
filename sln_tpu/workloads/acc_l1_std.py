"""Quantitative eval: L1 / scene-graph accuracy / sample-diversity std.

Reference: testing/test_acc_mean_std.py (`test.py --measure_acc_l1_std`)
with the predicate re-derivation oracle of testing/test_utils.py:135-152,
fully vectorized: the per-triple Python loop over compute_rel becomes one
relation_matrix evaluation per batch on device.

Baselines mirror the reference: random-box scenes (same sizes, uniform
centers, test_utils.py:93-116) and gaussian-perturbed GT boxes
(test_acc_mean_std.py:113-114).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from sln_tpu.data.augment import SizeInfo, build_graphs
from sln_tpu.data.vocab import ROOM_IDX
from sln_tpu.ops.relations import P_IN_ROOM, relation_matrix
from sln_tpu.workloads import posterior


def _denormalize_j(boxes, room_mask):
    import jax.numpy as jnp
    w = room_mask.astype(boxes.dtype)
    dims = jnp.einsum("bo,bod->bd", w, boxes)[..., 3:]
    scale = jnp.concatenate([dims, dims], -1)[:, None, :]
    return jnp.where(room_mask[..., None], boxes, boxes * scale)


def scene_graph_acc_batch(objs, obj_mask, triples, triple_mask, boxes):
    """(num correct, num triples) for a padded batch.

    Semantics of testing/test_utils.py:135-152: boxes are denormalized with
    each scene's (possibly predicted/perturbed) room box, the geometric
    oracle re-derives each triple's predicate, and triples whose object is
    the __room__ node match iff the GT predicate is __in_room__ (the oracle
    short-circuits on the room name).
    """
    import jax
    import jax.numpy as jnp

    room_mask = (objs == ROOM_IDX) & obj_mask
    restored = _denormalize_j(boxes, room_mask)
    relmat = jax.vmap(relation_matrix)(restored)

    s, p, o = triples[..., 0], triples[..., 1], triples[..., 2]
    derived = jax.vmap(lambda rel, ss, oo: rel[ss, oo])(relmat, s, o)
    o_is_room = jnp.take_along_axis(room_mask, o, axis=-1)
    derived = jnp.where(o_is_room, P_IN_ROOM, derived)
    good = ((derived == p) & triple_mask).sum()
    total = triple_mask.sum()
    return good, total


def random_scene(key, objs, boxes, obj_mask):
    """Random-box baseline (test_utils.py:93-116): keep sizes, uniform
    centers, random angles; room rows unchanged."""
    import jax
    import jax.numpy as jnp

    k_c, k_a = jax.random.split(key)
    B, O = objs.shape
    size = boxes[..., 3:] - boxes[..., :3]
    center = jax.random.uniform(k_c, (B, O, 3))
    rand = jnp.concatenate([center - size / 2, center + size / 2], axis=-1)
    room = (objs == ROOM_IDX)
    boxes_rand = jnp.where(room[..., None], boxes, rand)
    angles_rand = jax.random.randint(k_a, (B, O), 0, 24)
    return boxes_rand, angles_rand


def perturbed_scene(key, boxes):
    """GT + N(0, 0.1) center offsets on every row (test_acc_mean_std.py:113)."""
    import jax
    import jax.numpy as jnp
    off = 0.1 * jax.random.normal(key, boxes.shape[:-1] + (3,))
    return boxes + jnp.concatenate([off, off], axis=-1)


def masked_l1(pred, target, mask):
    import jax.numpy as jnp
    m = mask.astype(jnp.float32)[..., None]
    n = jnp.maximum(m.sum() * pred.shape[-1], 1.0)
    return (jnp.abs(pred - target) * m).sum() / n


def run_acc_l1(model, variables, val_arrays: Dict[str, np.ndarray],
               size_info: SizeInfo, cfg, mean: np.ndarray, cov: np.ndarray,
               batch_size: int = 256, seed: int = 0) -> Dict[str, float]:
    """Reference get_acc_l1 (test_acc_mean_std.py:71-125)."""
    import jax
    import jax.numpy as jnp

    from sln_tpu.models.vae import Sg2ScVAE

    @jax.jit
    def eval_batch(key, objs, boxes, angles, mask, room_ids):
        kg, kz, kr, kp = jax.random.split(key, 4)
        batch = build_graphs(kg, objs, boxes, angles, mask, room_ids,
                             size_info, max_on_rels=cfg.data.max_on_rels,
                             use_attr_30=cfg.data.use_attr_30)
        B, O = objs.shape
        z = posterior.sample_z(kz, mean, cov, (B, O))
        boxes_pred, _ = model.apply(variables, z, batch, False,
                                    method=Sg2ScVAE.decode)
        boxes_rand, _ = random_scene(kr, objs, boxes, mask)
        boxes_pert = perturbed_scene(kp, boxes)

        out = {}
        for name, bx in (("pred", boxes_pred), ("rand", boxes_rand),
                         ("pert", boxes_pert)):
            out[f"l1_{name}"] = masked_l1(bx, boxes, mask)
            good, total = scene_graph_acc_batch(
                objs, mask, batch.triples, batch.triple_mask, bx)
            out[f"good_{name}"] = good
            out[f"total_{name}"] = total
        return out

    l1s = {"pred": [], "rand": [], "pert": []}
    goods = {"pred": 0, "rand": 0, "pert": 0}
    totals = 0
    n = val_arrays["objs"].shape[0]
    key = jax.random.PRNGKey(seed)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        pad = batch_size - len(idx)
        if pad:  # evaluate only full batches by wrapping then masking out
            idx_full = np.concatenate([idx, np.zeros(pad, np.int64)])
            mask = val_arrays["obj_mask"][idx_full].copy()
            mask[len(idx):] = False
        else:
            idx_full = idx
            mask = val_arrays["obj_mask"][idx_full]
        out = eval_batch(jax.random.fold_in(key, start),
                         val_arrays["objs"][idx_full],
                         val_arrays["boxes"][idx_full],
                         val_arrays["angles"][idx_full], mask,
                         val_arrays["room_ids"][idx_full])
        for name in ("pred", "rand", "pert"):
            l1s[name].append(float(out[f"l1_{name}"]))
            goods[name] += int(out[f"good_{name}"])
        totals += int(out["total_pred"])

    result = {}
    for name in ("pred", "rand", "pert"):
        result[f"l1_{name}"] = float(np.mean(l1s[name]))
        result[f"acc_{name}"] = goods[name] / max(totals, 1)
    result["total_triples"] = totals
    return result


def run_std(model, variables, val_arrays: Dict[str, np.ndarray],
            size_info: SizeInfo, cfg, mean: np.ndarray, cov: np.ndarray,
            nsample: int = 10, batch_size: int = 256,
            seed: int = 0) -> Dict[str, float]:
    """Reference get_std (test_acc_mean_std.py:10-69): per-object std of
    angle / position / size over `nsample` decodes, averaged."""
    import jax
    import jax.numpy as jnp

    from sln_tpu.models.vae import Sg2ScVAE

    @jax.jit
    def eval_batch(key, objs, boxes, angles, mask, room_ids):
        kg, kz = jax.random.split(key)
        batch = build_graphs(kg, objs, boxes, angles, mask, room_ids,
                             size_info, max_on_rels=cfg.data.max_on_rels,
                             use_attr_30=cfg.data.use_attr_30)
        B, O = objs.shape
        z = posterior.sample_z(kz, mean, cov, (nsample, B, O))

        def dec(zk):
            bx, ap = model.apply(variables, zk, batch, False,
                                 method=Sg2ScVAE.decode)
            return bx, jnp.argmax(ap, axis=-1).astype(jnp.float32)
        boxes_s, angles_s = jax.vmap(dec)(z)          # (S, B, O, 6), (S,B,O)

        pos = (boxes_s[..., :3] + boxes_s[..., 3:]) / 2.0
        size = jnp.abs(boxes_s[..., :3] - boxes_s[..., 3:])
        m = mask.astype(jnp.float32)
        mn = jnp.maximum(m.sum(), 1.0)

        def masked_mean_std(x):
            sd = jnp.std(x, axis=0)                   # (B, O, ...)
            if sd.ndim == 3:
                return (sd * m[..., None]).sum() / (mn * sd.shape[-1])
            return (sd * m).sum() / mn

        return (masked_mean_std(angles_s), masked_mean_std(pos),
                masked_mean_std(size))

    stds = {"angle": [], "pos": [], "size": []}
    n = val_arrays["objs"].shape[0]
    key = jax.random.PRNGKey(seed + 1)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        pad = batch_size - len(idx)
        if pad:
            idx_full = np.concatenate([idx, np.zeros(pad, np.int64)])
            mask = val_arrays["obj_mask"][idx_full].copy()
            mask[len(idx):] = False
        else:
            idx_full = idx
            mask = val_arrays["obj_mask"][idx_full]
        a, p, s = eval_batch(jax.random.fold_in(key, start),
                             val_arrays["objs"][idx_full],
                             val_arrays["boxes"][idx_full],
                             val_arrays["angles"][idx_full], mask,
                             val_arrays["room_ids"][idx_full])
        stds["angle"].append(float(a))
        stds["pos"].append(float(p))
        stds["size"].append(float(s))
    return {f"std_{k}": float(np.mean(v)) for k, v in stds.items()}
