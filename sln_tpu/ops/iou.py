"""Rotated-cuboid IoU, fully vectorized in JAX.

Replaces the reference's shapely/GEOS path (testing/test_utils.py:33-40):
polygon intersection of the two rotated xz footprints (Sutherland-Hodgman
clipping of convex quads, static shapes) times the y overlap. A C++ host
implementation with identical semantics lives in sln_tpu/cpp/native.cpp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_VERTS = 16  # 4-gon clipped by 4 half-planes grows to at most 8; pad


def _clip_by_edge(poly: jnp.ndarray, count: jnp.ndarray, a: jnp.ndarray,
                  b: jnp.ndarray):
    """Clip padded polygon (MAX_VERTS, 2) by the half-plane left of a->b."""
    d = b - a
    # signed 'inside' measure for every vertex
    rel = poly - a[None]
    side = d[0] * rel[:, 1] - d[1] * rel[:, 0]          # > 0 = inside

    idx = jnp.arange(MAX_VERTS)
    valid = idx < count
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    p_cur = poly
    p_nxt = poly[nxt]
    s_cur = side
    s_nxt = side[nxt]

    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    inter = p_cur + t[:, None] * (p_nxt - p_cur)

    # each input edge emits up to 2 vertices:
    #   cur inside  -> emit cur; and if next outside -> emit intersection
    #   cur outside -> if next inside -> emit intersection
    cur_in = s_cur >= 0
    nxt_in = s_nxt >= 0
    emit1 = valid & cur_in
    emit2 = valid & (cur_in ^ nxt_in)
    v1 = p_cur
    v2 = inter

    # compact: positions via cumulative counts
    n1 = emit1.astype(jnp.int32)
    n2 = emit2.astype(jnp.int32)
    per_edge = n1 + n2
    start = jnp.cumsum(per_edge) - per_edge
    out = jnp.zeros((MAX_VERTS, 2), poly.dtype)
    pos1 = start
    pos2 = start + n1

    def place(out, pos, emit, v):
        oh = (jnp.arange(MAX_VERTS)[:, None] == pos[None, :]) \
            & emit[None, :]
        return out + oh.astype(v.dtype) @ v

    out = place(out, pos1, emit1, v1)
    out = place(out, pos2, emit2, v2)
    new_count = per_edge.sum()
    return out, new_count


def convex_intersection_area(quad_a: jnp.ndarray,
                             quad_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quads (4, 2), any winding."""
    def _ccw(q):
        # enforce counter-clockwise orientation
        area2 = jnp.sum(q[:, 0] * jnp.roll(q[:, 1], -1)
                        - jnp.roll(q[:, 0], -1) * q[:, 1])
        return jnp.where(area2 >= 0, q, q[::-1])

    qa = _ccw(quad_a)
    qb = _ccw(quad_b)
    poly = jnp.zeros((MAX_VERTS, 2), quad_a.dtype).at[:4].set(qa)
    count = jnp.asarray(4, jnp.int32)
    for k in range(4):
        poly, count = _clip_by_edge(poly, count, qb[k], qb[(k + 1) % 4])
    # shoelace over the valid prefix
    idx = jnp.arange(MAX_VERTS)
    valid = idx < count
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    x, y = poly[:, 0], poly[:, 1]
    terms = (x * y[nxt] - x[nxt] * y) * valid
    return jnp.abs(terms.sum()) / 2.0


def cuboid_iou(cu1_corners: jnp.ndarray, cu1_ymin, cu1_ymax,
               cu2_corners: jnp.ndarray, cu2_ymin, cu2_ymax) -> jnp.ndarray:
    """Reference get_iou_cuboid (test_utils.py:33-40): xz polygon
    intersection x y-overlap, +1e-5 in the denominator."""
    inter2d = convex_intersection_area(cu1_corners, cu2_corners)
    h = jnp.maximum(0.0, jnp.minimum(cu1_ymax, cu2_ymax)
                    - jnp.maximum(cu1_ymin, cu2_ymin))
    inter = inter2d * h

    def quad_area(q):
        return jnp.abs(jnp.sum(q[:, 0] * jnp.roll(q[:, 1], -1)
                               - jnp.roll(q[:, 0], -1) * q[:, 1])) / 2.0

    v1 = quad_area(cu1_corners) * (cu1_ymax - cu1_ymin)
    v2 = quad_area(cu2_corners) * (cu2_ymax - cu2_ymin)
    return inter / (v1 + v2 - inter + 1e-5)


def rotated_box_corners(box: jnp.ndarray, angle: jnp.ndarray,
                        room_dims: jnp.ndarray) -> jnp.ndarray:
    """Normalized box + angle bin -> 4 rotated xz corners
    (test_plot2d.py:84-110 math). Returns ((4, 2) corners, ymin, ymax)."""
    lo = box[:3] * room_dims
    hi = box[3:] * room_dims
    center = (lo + hi) / 2.0
    lo_c, hi_c = lo - center, hi - center
    theta = -angle * (2.0 * jnp.pi / 24.0)
    c, s = jnp.cos(theta), jnp.sin(theta)

    def rot(p):
        return jnp.stack([c * p[0] + s * p[2], p[1],
                          -s * p[0] + c * p[2]])

    p1 = rot(lo_c) + center
    p2 = rot(jnp.stack([lo_c[0], lo_c[1], hi_c[2]])) + center
    p3 = rot(hi_c) + center
    p4 = rot(jnp.stack([hi_c[0], lo_c[1], lo_c[2]])) + center
    corners = jnp.stack([p1[jnp.array([0, 2])], p2[jnp.array([0, 2])],
                         p3[jnp.array([0, 2])], p4[jnp.array([0, 2])]])
    return corners, lo[1], hi[1]


def layout_iou(boxes1, angles1, boxes2, angles2, room_dims):
    """Per-object IoU between two layouts; vmapped over objects."""
    def one(b1, a1, b2, a2):
        c1, y1a, y1b = rotated_box_corners(b1, a1, room_dims)
        c2, y2a, y2b = rotated_box_corners(b2, a2, room_dims)
        return cuboid_iou(c1, y1a, y1b, c2, y2a, y2b)

    return jax.vmap(one)(boxes1, angles1, boxes2, angles2)
