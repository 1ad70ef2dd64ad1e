"""Pallas rasterizer (interpret mode on CPU) vs the pure-JAX reference:
forward equality and gradient equality."""

import numpy as np
import jax
import jax.numpy as jnp

from sln_tpu.render.rasterizer import face_geometry, soft_rasterize
from sln_tpu.render import rasterizer_pallas as rp

S = 32
ZFAR = 100.0


def random_geom(n=23, seed=0):
    rng = np.random.default_rng(seed)
    tris, zs, cls, valid = [], [], [], []
    for i in range(n):
        a = rng.uniform(0, S, 2)
        tris.append([a, a + rng.uniform(-12, 12, 2),
                     a + rng.uniform(-12, 12, 2)])
        zs.append(rng.uniform(2, 12, 3))
        cls.append(rng.integers(0, 5))
        valid.append(rng.random() > 0.2)
    v2d = jnp.asarray(np.array(tris, np.float32))
    z = jnp.asarray(np.array(zs, np.float32))
    return (v2d, z, jnp.asarray(np.array(valid)),
            jnp.asarray(np.array(cls, np.int32)))


def test_pallas_forward_matches_jax():
    v2d, z, valid, cls = random_geom()
    geom = face_geometry(v2d, z, valid, cls)
    d_ref, c_ref = soft_rasterize(geom, 5, S, sigma=0.7, gamma=0.02,
                                  z_far=ZFAR)
    d_pl, c_pl = rp.soft_rasterize_pallas(geom, 5, S, sigma=0.7,
                                          gamma=0.02, z_far=ZFAR)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_gradients_match_jax():
    v2d, z, valid, cls = random_geom(n=11, seed=3)

    def loss_ref(v2d, z):
        geom = face_geometry(v2d, z, valid, cls)
        d, c = soft_rasterize(geom, 5, S, sigma=0.7, gamma=0.02,
                              z_far=ZFAR)
        return d.mean() + (c * jnp.arange(5)).sum() * 1e-2

    def loss_pl(v2d, z):
        geom = face_geometry(v2d, z, valid, cls)
        d, c = rp.soft_rasterize_pallas(geom, 5, S, sigma=0.7, gamma=0.02,
                                        z_far=ZFAR)
        return d.mean() + (c * jnp.arange(5)).sum() * 1e-2

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(v2d, z)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(v2d, z)
    for a, b in zip(g_pl, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3 * scale)


def test_pallas_vmap_batched_scenes():
    """Batched (vmapped) rasterization must equal per-scene calls — the
    serving/bench configuration; vmap prepends a batch dimension to the
    SMEM chunk-list operands (counts must stay 2-D for Mosaic)."""
    geoms = [face_geometry(*random_geom(seed=s)) for s in (0, 1, 2)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *geoms)

    run = lambda g: rp.soft_rasterize_pallas(g, 5, S, sigma=0.7,
                                             gamma=0.02, z_far=ZFAR)
    d_b, c_b = jax.jit(jax.vmap(run))(batched)
    for i, g in enumerate(geoms):
        d_i, c_i = run(g)
        np.testing.assert_allclose(np.asarray(d_b[i]), np.asarray(d_i),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_b[i]), np.asarray(c_i),
                                   rtol=1e-5, atol=1e-5)


def test_chunk_lists_prefix_matches_mask():
    mask = jnp.asarray(np.array([[1, 0, 1, 0], [0, 0, 0, 0],
                                 [1, 1, 1, 1]], np.float32))
    counts, clist = rp.chunk_lists(mask)
    assert counts.shape == (3, 1)       # 2-D: SMEM under vmap (Mosaic rule)
    np.testing.assert_array_equal(np.asarray(counts[:, 0]), [2, 0, 4])
    np.testing.assert_array_equal(np.asarray(clist[0, :2]), [0, 2])
    np.testing.assert_array_equal(np.asarray(clist[2]), [0, 1, 2, 3])
