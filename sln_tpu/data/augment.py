"""On-device stochastic scene-graph construction.

The reference builds scene graphs per item in Python DataLoader workers with
`random` (reference: data/suncg_dataset.py:168-289): all 'on' relations, one
random relation per object (skipping 'on'-related pairs), one __in_room__
edge per object, and random size attributes. That per-item Python loop is
the CPU hot spot of the reference training path (SURVEY §3.1).

Here the whole construction is a jitted, vmapped JAX function driven by
jax.random, so augmentation runs on-TPU inside the train step with zero
host work. Semantics match the reference's sampler distribution-for-
distribution; the only capacity deviation is the static cap of
`max_on_rels` 'on' triples per scene (SUNCG rooms have far fewer).

Triple slot layout per scene (T = max_on + 2*O):
    [0, max_on)           'on' triples
    [max_on, max_on+O)    random triples (slot i for subject-or-object i)
    [max_on+O, max_on+2O) __in_room__ triples (slot i for object i)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sln_tpu.data.batch import SceneBatch
from sln_tpu.data.vocab import ROOM_IDX
from sln_tpu.ops.relations import P_IN_ROOM, P_ON, relation_matrix


class SizeInfo(NamedTuple):
    """Per-class attribute thresholds (see data.synthetic.default_size_table)."""
    table: jnp.ndarray    # (C, 4) [height_3, height_7, volume_3, volume_7]
    median: jnp.ndarray   # (C, 2) [height_med, volume_med]
    avail: jnp.ndarray    # (C,) bool


def _denormalize(boxes: jnp.ndarray, room_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, O, 6) normalized (room absolute) -> all absolute."""
    w = room_mask.astype(boxes.dtype)
    room_dims = jnp.einsum("bo,bod->bd", w, boxes)[..., 3:]        # (B, 3)
    scale = jnp.concatenate([room_dims, room_dims], -1)[:, None, :]
    return jnp.where(room_mask[..., None], boxes, boxes * scale)


@functools.partial(jax.jit, static_argnames=("max_on_rels", "use_attr_30"))
def build_graphs(key: jax.Array, objs: jnp.ndarray, boxes: jnp.ndarray,
                 angles: jnp.ndarray, obj_mask: jnp.ndarray,
                 room_ids: jnp.ndarray, size_info: SizeInfo,
                 max_on_rels: int = 32, use_attr_30: bool = True
                 ) -> SceneBatch:
    """Sample triples + attributes for a padded batch of scenes."""
    B, O = objs.shape
    k_partner, k_swap, k_a1, k_a2 = jax.random.split(key, 4)

    room_mask = (objs == ROOM_IDX) & obj_mask
    real_mask = obj_mask & ~room_mask
    room_slot = jnp.argmax(room_mask, axis=-1)                      # (B,)

    abs_boxes = _denormalize(boxes, room_mask)
    relmat = jax.vmap(relation_matrix)(abs_boxes)                   # (B, O, O)

    eye = jnp.eye(O, dtype=bool)
    pair_real = real_mask[:, :, None] & real_mask[:, None, :] & ~eye
    on_valid = pair_real & (relmat == P_ON)                         # (B, O, O)

    # ---- 'on' triples: first max_on_rels true pairs in row-major order
    # (reference suncg_dataset.py:180-190 adds all of them in this order).
    flat_on = on_valid.reshape(B, O * O)
    order = jnp.argsort(~flat_on, axis=-1, stable=True)[:, :max_on_rels]
    on_sel_valid = jnp.take_along_axis(flat_on, order, axis=-1)
    on_s = (order // O).astype(jnp.int32)
    on_o = (order % O).astype(jnp.int32)
    on_triples = jnp.stack(
        [on_s, jnp.full_like(on_s, P_ON), on_o], axis=-1)

    # ---- one random relation per real object (suncg_dataset.py:192-205)
    partner_ok = pair_real                                           # (B,O,O)
    g = jax.random.gumbel(k_partner, (B, O, O))
    scores = jnp.where(partner_ok, g, -jnp.inf)
    partner = jnp.argmax(scores, axis=-1).astype(jnp.int32)         # (B, O)
    has_partner = partner_ok.any(axis=-1)
    swap = jax.random.bernoulli(k_swap, 0.5, (B, O))
    i_idx = jnp.broadcast_to(jnp.arange(O, dtype=jnp.int32), (B, O))
    rand_s = jnp.where(swap, partner, i_idx)
    rand_o = jnp.where(swap, i_idx, partner)
    # skip pairs already related by 'on' in either direction (:200-201)
    def _at(m, s, o):
        return jax.vmap(lambda mm, ss, oo: mm[ss, oo])(m, s, o)
    on_between = (_at(on_valid, rand_s, rand_o)
                  | _at(on_valid, rand_o, rand_s))
    rand_p = _at(relmat, rand_s, rand_o)
    rand_valid = real_mask & has_partner & ~on_between
    rand_triples = jnp.stack([rand_s, rand_p, rand_o], axis=-1)

    # ---- __in_room__ triples (suncg_dataset.py:207-212)
    in_room_valid = obj_mask & ~room_mask
    room_o = jnp.broadcast_to(room_slot[:, None], (B, O)).astype(jnp.int32)
    in_room_triples = jnp.stack(
        [i_idx, jnp.full_like(i_idx, P_IN_ROOM), room_o], axis=-1)

    triples = jnp.concatenate(
        [on_triples, rand_triples, in_room_triples], axis=1)
    triple_mask = jnp.concatenate(
        [on_sel_valid, rand_valid, in_room_valid], axis=1)
    triples = jnp.where(triple_mask[..., None], triples, 0)

    # ---- attributes from normalized sizes (suncg_dataset.py:233-289)
    nh = boxes[..., 4] - boxes[..., 1]
    nv = ((boxes[..., 3] - boxes[..., 0]) * nh
          * (boxes[..., 5] - boxes[..., 2]))
    cls = objs
    avail = size_info.avail[cls]
    r_none = jax.random.uniform(k_a1, (B, O)) > 0.5
    r_height = jax.random.uniform(k_a2, (B, O)) > 0.5
    if use_attr_30:
        h3, h7 = size_info.table[cls, 0], size_info.table[cls, 1]
        v3, v7 = size_info.table[cls, 2], size_info.table[cls, 3]
        by_h = jnp.where(nh > h7, 1, jnp.where(nh < h3, 2, 0))
        by_v = jnp.where(nv > v7, 3, jnp.where(nv < v3, 4, 0))
    else:
        hm, vm = size_info.median[cls, 0], size_info.median[cls, 1]
        by_h = jnp.where(nh > hm, 1, 2)
        by_v = jnp.where(nv > vm, 3, 4)
    attrs = jnp.where(r_none | ~avail, 0, jnp.where(r_height, by_h, by_v))
    attrs = jnp.where(real_mask, attrs, 0).astype(jnp.int32)  # room/pad: none

    return SceneBatch(
        objs=objs.astype(jnp.int32), boxes=boxes.astype(jnp.float32),
        angles=angles.astype(jnp.int32), attrs=attrs,
        obj_mask=obj_mask, triples=triples.astype(jnp.int32),
        triple_mask=triple_mask, room_ids=room_ids.astype(jnp.int32))
