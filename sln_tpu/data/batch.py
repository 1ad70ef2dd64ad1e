"""Static-shape padded scene-graph batch container.

Replaces the reference's ragged flattened batch (one big variable-size graph
per batch, reference: data/suncg_dataset.py:295-337) with fixed shapes XLA
can compile once:

* per scene, object slots [0 .. n-2] hold real objects, slot n-1 holds the
  __room__ node (same ordering as the reference's per-scene lists), and
  slots >= n are padding with obj_mask False;
* triples carry per-scene *local* [subject, predicate, object] indices;
* padding rows use index 0 / class 0 and are excluded by masks everywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sln_tpu.data.vocab import ROOM_IDX


class SceneBatch(NamedTuple):
    objs: jnp.ndarray          # (B, O) int32 object class ids
    boxes: jnp.ndarray         # (B, O, 6) float32 normalized boxes
    angles: jnp.ndarray        # (B, O) int32 in [0, 24)
    attrs: jnp.ndarray         # (B, O) int32 in [0, 5)
    obj_mask: jnp.ndarray      # (B, O) bool
    triples: jnp.ndarray       # (B, T, 3) int32 [s_local, pred, o_local]
    triple_mask: jnp.ndarray   # (B, T) bool
    room_ids: jnp.ndarray      # (B,) int32

    @property
    def batch_size(self) -> int:
        return self.objs.shape[0]

    @property
    def max_objects(self) -> int:
        return self.objs.shape[1]

    @property
    def max_triples(self) -> int:
        return self.triples.shape[1]

    @property
    def edges(self) -> jnp.ndarray:
        """(B, T, 2) [subject, object] local indices."""
        return self.triples[..., jnp.array([0, 2])]

    @property
    def preds(self) -> jnp.ndarray:
        return self.triples[..., 1]

    @property
    def room_mask(self) -> jnp.ndarray:
        """(B, O) bool: True at each scene's __room__ node."""
        return (self.objs == ROOM_IDX) & self.obj_mask

    @property
    def num_objects(self) -> jnp.ndarray:
        """(B,) number of valid object slots (incl. the room node)."""
        return self.obj_mask.sum(axis=-1).astype(jnp.int32)

    def room_boxes(self) -> jnp.ndarray:
        """(B, 6) the room bounding box of each scene."""
        w = self.room_mask.astype(self.boxes.dtype)
        return jnp.einsum("bo,bod->bd", w, self.boxes)


def make_scene_batch(objs, boxes, angles, attrs, obj_mask, triples,
                     triple_mask, room_ids=None) -> SceneBatch:
    """Build a SceneBatch from numpy or jax arrays with dtype coercion."""
    B = np.shape(objs)[0]
    if room_ids is None:
        room_ids = np.arange(B, dtype=np.int32)
    return SceneBatch(
        objs=jnp.asarray(objs, jnp.int32),
        boxes=jnp.asarray(boxes, jnp.float32),
        angles=jnp.asarray(angles, jnp.int32),
        attrs=jnp.asarray(attrs, jnp.int32),
        obj_mask=jnp.asarray(obj_mask, bool),
        triples=jnp.asarray(triples, jnp.int32),
        triple_mask=jnp.asarray(triple_mask, bool),
        room_ids=jnp.asarray(room_ids, jnp.int32),
    )
