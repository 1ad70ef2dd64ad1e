"""Soft rasterizer: geometric correctness, flash==naive equivalence, and
finite-difference gradient checks."""

import numpy as np
import jax
import jax.numpy as jnp

from sln_tpu.render.rasterizer import (FaceGeometry, face_geometry,
                                       soft_rasterize, soft_rasterize_naive)

S = 32
ZFAR = 100.0


def make_geom(tris, zs, classes):
    """tris: list of (3, 2) pixel coords; zs: per-face scalar depth."""
    v2d = jnp.asarray(np.array(tris, np.float32))
    z = jnp.asarray(np.array(zs, np.float32))[:, None] * jnp.ones((1, 3))
    valid = jnp.ones((len(tris),), bool)
    fc = jnp.asarray(np.array(classes, np.int32))
    return face_geometry(v2d, z, valid, fc)


def test_single_triangle_coverage_and_depth():
    # big triangle covering the lower-left half of the image
    tri = [[(0.0, 0.0), (S, 0.0), (0.0, S)]]
    geom = make_geom(tri, [5.0], [0])
    depth, classes = soft_rasterize_naive(geom, 1, S, sigma=0.3,
                                          gamma=1e-3, z_far=ZFAR)
    depth, classes = np.asarray(depth), np.asarray(classes)
    # interior pixel
    assert abs(depth[4, 4] - 5.0) < 0.05
    assert classes[4, 4, 0] > 0.99
    # exterior pixel
    assert depth[30, 30] > 50.0
    assert classes[30, 30, 0] < 0.01


def test_flash_matches_naive():
    rng = np.random.default_rng(0)
    tris, zs, cls = [], [], []
    for i in range(37):
        a = rng.uniform(0, S, 2)
        tris.append([a, a + rng.uniform(-12, 12, 2),
                     a + rng.uniform(-12, 12, 2)])
        zs.append(rng.uniform(2, 12))
        cls.append(rng.integers(0, 5))
    geom = make_geom(tris, zs, cls)
    d1, c1 = soft_rasterize_naive(geom, 5, S, sigma=0.7, gamma=1e-2,
                                  z_far=ZFAR)
    d2, c2 = soft_rasterize(geom, 5, S, sigma=0.7, gamma=1e-2, z_far=ZFAR,
                            chunk=8)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4,
                               atol=1e-5)


def test_occlusion():
    # two stacked triangles; the nearer one must own the class probability
    tri = [(2.0, 2.0), (30.0, 2.0), (2.0, 30.0)]
    geom = make_geom([tri, tri], [3.0, 9.0], [0, 1])
    depth, classes = soft_rasterize_naive(geom, 2, S, sigma=0.3,
                                          gamma=1e-3, z_far=ZFAR)
    classes = np.asarray(classes)
    assert classes[5, 5, 0] > 0.95       # near face (class 0) wins
    assert classes[5, 5, 1] < 0.05
    assert abs(np.asarray(depth)[5, 5] - 3.0) < 0.05


def test_vertex_gradients_finite_difference():
    tri0 = np.array([[4.0, 4.0], [24.0, 6.0], [8.0, 26.0]], np.float32)

    def render_loss(v2d_flat):
        v2d = v2d_flat.reshape(1, 3, 2)
        z = jnp.full((1, 3), 5.0)
        geom = face_geometry(v2d, z, jnp.ones((1,), bool),
                             jnp.zeros((1,), jnp.int32))
        depth, classes = soft_rasterize_naive(geom, 1, S, sigma=1.0,
                                              gamma=1e-2, z_far=ZFAR)
        # silhouette-style loss: how much class-0 coverage exists
        return classes[..., 0].sum()

    x0 = jnp.asarray(tri0.reshape(-1))
    g = np.asarray(jax.grad(render_loss)(x0))
    # moving vertices outward grows the triangle -> coverage gradient != 0
    assert np.abs(g).max() > 1e-3

    eps = 1e-2
    for i in range(6):
        e = np.zeros(6, np.float32)
        e[i] = eps
        f_plus = float(render_loss(x0 + e))
        f_minus = float(render_loss(x0 - e))
        fd = (f_plus - f_minus) / (2 * eps)
        assert abs(fd - g[i]) < 0.05 * max(abs(fd), abs(g[i]), 1.0), (
            i, fd, g[i])


def test_depth_gradients_move_faces():
    """Pushing a face's vertices deeper should increase rendered depth."""
    tri = jnp.asarray([[[4.0, 4.0], [28.0, 4.0], [4.0, 28.0]]])

    def loss(zval):
        z = jnp.full((1, 3), zval)
        geom = face_geometry(tri, z, jnp.ones((1,), bool),
                             jnp.zeros((1,), jnp.int32))
        depth, _ = soft_rasterize_naive(geom, 1, S, sigma=0.5, gamma=1e-2,
                                        z_far=ZFAR)
        return depth.mean()

    g = float(jax.grad(loss)(jnp.float32(5.0)))
    assert g > 0.0
