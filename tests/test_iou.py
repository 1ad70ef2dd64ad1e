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
