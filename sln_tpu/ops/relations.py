"""Geometric relationship oracle.

Re-implements the predicate logic of the reference's `compute_rel`
(reference: utils.py:36-80) in two forms:

* `compute_rel_host` — scalar numpy, semantics-identical, used by dataset
  tooling and as the golden oracle in tests.
* `relation_matrix` — fully vectorized JAX giving the (O, O) pairwise
  predicate matrix in one shot. This runs jitted on TPU and powers both the
  on-device scene-graph augmentation (replacing the per-item Python loops at
  reference data/suncg_dataset.py:178-212) and the scene-graph accuracy
  metric (reference testing/test_utils.py:135-152).

Boxes are (x0, y0, z0, x1, y1, z1); y is up.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sln_tpu.data.vocab import PRED_IDX_TO_NAME

# Predicate indices (sln_tpu.data.vocab.PRED_IDX_TO_NAME order).
P_IN_ROOM = 0
P_LEFT_OF = 1
P_RIGHT_OF = 2
P_BEHIND = 3
P_IN_FRONT_OF = 4
P_INSIDE = 5
P_SURROUNDING = 6
P_LEFT_TOUCHING = 7
P_RIGHT_TOUCHING = 8
P_FRONT_TOUCHING = 9
P_BEHIND_TOUCHING = 10
P_ON = 15

ON_DELTA_THRESHOLD = 0.05      # reference: utils.py:49
TOUCH_IOU_LO = 0.0001          # reference: utils.py:65
TOUCH_IOU_HI = 0.5


def compute_rel_host(box1, box2, name1=None, name2=None) -> str:
    """Scalar oracle, returns the predicate *name* (reference: utils.py:36-80)."""
    box1 = np.asarray(box1, dtype=np.float64)
    box2 = np.asarray(box2, dtype=np.float64)
    c1 = (box1[:3] + box1[3:]) / 2.0
    c2 = (box2[:3] + box2[3:]) / 2.0

    if name2 == "__room__":
        return "__in_room__"

    # 'on': subject center inside object's xz footprint, resting on top.
    if box2[0] <= c1[0] <= box2[3] and box2[2] <= c1[2] <= box2[5]:
        delta1 = c1[1] - c2[1]
        delta2 = (box1[4] - box1[1] + box2[4] - box2[1]) / 2.0
        if abs(delta1 - delta2) < ON_DELTA_THRESHOLD:
            return "on"

    d = c1 - c2
    theta = math.atan2(d[2], d[0])

    area_s = (box1[3] - box1[0]) * (box1[5] - box1[2])
    area_o = (box2[3] - box2[0]) * (box2[5] - box2[2])
    ix0, ix1 = max(box1[0], box2[0]), min(box1[3], box2[3])
    iz0, iz1 = max(box1[2], box2[2]), min(box1[5], box2[5])
    area_i = max(0.0, ix1 - ix0) * max(0.0, iz1 - iz0)
    iou = area_i / (area_s + area_o - area_i)
    touching = TOUCH_IOU_LO < iou < TOUCH_IOU_HI

    if (box1[0] < box2[0] and box1[3] > box2[3]
            and box1[2] < box2[2] and box1[5] > box2[5]):
        return "surrounding"
    if (box1[0] > box2[0] and box1[3] < box2[3]
            and box1[2] > box2[2] and box1[5] < box2[5]):
        return "inside"
    if theta >= 3 * math.pi / 4 or theta <= -3 * math.pi / 4:
        return "right touching" if touching else "left of"
    if -3 * math.pi / 4 <= theta < -math.pi / 4:
        return "behind touching" if touching else "behind"
    if -math.pi / 4 <= theta < math.pi / 4:
        return "left touching" if touching else "right of"
    # math.pi / 4 <= theta < 3 * math.pi / 4
    return "front touching" if touching else "in front of"


def compute_rel_host_idx(box1, box2, name1=None, name2=None) -> int:
    return PRED_IDX_TO_NAME.index(compute_rel_host(box1, box2, name1, name2))


def relation_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise predicate matrix.

    Args:
      boxes: (O, 6) float array; rows may include padding (caller masks).

    Returns:
      (O, O) int32 where entry [i, j] is the predicate index the oracle
      assigns to subject i and object j (diagonal is meaningless). The
      `__in_room__` override for room objects is the caller's concern.
    """
    boxes = boxes.astype(jnp.float32)
    c = (boxes[:, :3] + boxes[:, 3:]) / 2.0                     # (O, 3)

    # Pairwise quantities; index order [subject i, object j].
    d = c[:, None, :] - c[None, :, :]                           # (O, O, 3)
    theta = jnp.arctan2(d[..., 2], d[..., 0])

    # 'on' test
    cx, cy, cz = c[:, 0], c[:, 1], c[:, 2]
    in_x = (cx[:, None] >= boxes[None, :, 0]) & (cx[:, None] <= boxes[None, :, 3])
    in_z = (cz[:, None] >= boxes[None, :, 2]) & (cz[:, None] <= boxes[None, :, 5])
    h = boxes[:, 4] - boxes[:, 1]
    delta1 = cy[:, None] - cy[None, :]
    delta2 = (h[:, None] + h[None, :]) / 2.0
    is_on = in_x & in_z & (jnp.abs(delta1 - delta2) < ON_DELTA_THRESHOLD)

    # xz-plane IoU for the touching test
    area = (boxes[:, 3] - boxes[:, 0]) * (boxes[:, 5] - boxes[:, 2])    # (O,)
    ix0 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    ix1 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    iz0 = jnp.maximum(boxes[:, None, 2], boxes[None, :, 2])
    iz1 = jnp.minimum(boxes[:, None, 5], boxes[None, :, 5])
    area_i = jnp.maximum(0.0, ix1 - ix0) * jnp.maximum(0.0, iz1 - iz0)
    denom = area[:, None] + area[None, :] - area_i
    iou = area_i / jnp.where(denom > 0, denom, 1.0)
    touching = (iou > TOUCH_IOU_LO) & (iou < TOUCH_IOU_HI)

    surrounding = ((boxes[:, None, 0] < boxes[None, :, 0])
                   & (boxes[:, None, 3] > boxes[None, :, 3])
                   & (boxes[:, None, 2] < boxes[None, :, 2])
                   & (boxes[:, None, 5] > boxes[None, :, 5]))
    inside = ((boxes[:, None, 0] > boxes[None, :, 0])
              & (boxes[:, None, 3] < boxes[None, :, 3])
              & (boxes[:, None, 2] > boxes[None, :, 2])
              & (boxes[:, None, 5] < boxes[None, :, 5]))

    pi = jnp.float32(math.pi)
    sector_lr = (theta >= 3 * pi / 4) | (theta <= -3 * pi / 4)
    sector_behind = (theta >= -3 * pi / 4) & (theta < -pi / 4)
    sector_right = (theta >= -pi / 4) & (theta < pi / 4)
    # remaining sector: in front of

    directional = jnp.where(
        sector_lr,
        jnp.where(touching, P_RIGHT_TOUCHING, P_LEFT_OF),
        jnp.where(
            sector_behind,
            jnp.where(touching, P_BEHIND_TOUCHING, P_BEHIND),
            jnp.where(
                sector_right,
                jnp.where(touching, P_LEFT_TOUCHING, P_RIGHT_OF),
                jnp.where(touching, P_FRONT_TOUCHING, P_IN_FRONT_OF),
            ),
        ),
    ).astype(jnp.int32)

    pred = jnp.where(surrounding, P_SURROUNDING,
                     jnp.where(inside, P_INSIDE, directional))
    pred = jnp.where(is_on, P_ON, pred)
    return pred.astype(jnp.int32)


relation_matrix_jit = jax.jit(relation_matrix)
