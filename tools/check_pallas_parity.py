"""On-TPU Pallas <-> pure-JAX rasterizer parity check.

The unit tests compare the Pallas kernels against the pure-JAX flash
formulation in *interpret mode* on CPU (tests/test_rasterizer_pallas.py);
this tool runs the same comparison through the real Mosaic compile path on
the TPU so Mosaic-vs-interpret divergence (layout bugs, SMEM scalar
handling, fused-multiply reassociation) can't slip in unnoticed.

Checks, each on freshly perturbed inputs (the tunnel can replay identical
executions from a cache — CLAUDE.md "Measuring time"):
  1. forward depth + class channels, Pallas vs pure-JAX
  2. VJP w.r.t. vertices and z through both paths
Prints max abs/rel errors and PASS/FAIL against the recorded tolerances
(fwd atol 1e-3, grad rtol 2e-3 — the same bars the CPU tests use).

Usage: python tools/check_pallas_parity.py  (needs the real chip free)
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def random_geom(n=23, seed=0, size=32):
    rng = np.random.default_rng(seed)
    tris, zs, cls, valid = [], [], [], []
    for _ in range(n):
        a = rng.uniform(0, size, 2)
        tris.append([a, a + rng.uniform(-12, 12, 2),
                     a + rng.uniform(-12, 12, 2)])
        zs.append(rng.uniform(2, 12, 3))
        cls.append(rng.integers(0, 5))
        valid.append(rng.random() > 0.2)
    return (np.array(tris, np.float32), np.array(zs, np.float32),
            np.array(valid), np.array(cls, np.int32))


def main():
    import jax

    if "--cpu" in sys.argv:    # smoke-test the harness itself off-chip
        jax.config.update("jax_platforms", "cpu")
    # the pure-JAX reference path must not silently run its matmul-shaped
    # ops in bf16 on the MXU, or the comparison attributes its ~1e-2
    # rounding to the Pallas kernels (CLAUDE.md parity gotcha)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from sln_tpu.render import rasterizer_pallas as rp
    from sln_tpu.render.rasterizer import face_geometry, soft_rasterize

    size, ncls, zfar = 32, 5, 100.0
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})")
    if dev.platform == "cpu":
        print("WARNING: running on CPU — this exercises interpret mode, "
              "not Mosaic; run without JAX_PLATFORMS=cpu")

    kw = dict(sigma=0.7, gamma=0.02, z_far=zfar)
    failures = 0
    for seed in (0, 1, 2):
        v2d, z, valid, cls = random_geom(seed=seed, size=size)
        v2d_j, z_j = jnp.asarray(v2d), jnp.asarray(z)
        valid_j, cls_j = jnp.asarray(valid), jnp.asarray(cls)

        def run(fn, v2d, z):
            geom = face_geometry(v2d, z, valid_j, cls_j)
            return fn(geom, ncls, size, **kw)

        d_ref, c_ref = jax.jit(lambda v, z: run(soft_rasterize, v, z))(
            v2d_j, z_j)
        d_pl, c_pl = jax.jit(
            lambda v, z: run(rp.soft_rasterize_pallas, v, z))(v2d_j, z_j)
        fwd_err = max(float(jnp.abs(d_pl - d_ref).max()),
                      float(jnp.abs(c_pl - c_ref).max()))

        def loss(fn):
            def f(v2d, z):
                d, c = run(fn, v2d, z)
                return d.mean() + (c * jnp.arange(ncls)).sum() * 1e-2
            return f

        g_ref = jax.jit(jax.grad(loss(soft_rasterize), argnums=(0, 1)))(
            v2d_j, z_j)
        g_pl = jax.jit(jax.grad(loss(rp.soft_rasterize_pallas),
                                argnums=(0, 1)))(v2d_j, z_j)
        grad_err = 0.0
        for a, b in zip(g_pl, g_ref):
            a, b = np.asarray(a), np.asarray(b)
            if not np.isfinite(a).all():
                grad_err = np.inf
                break
            scale = max(np.abs(b).max(), 1e-3)
            grad_err = max(grad_err, float(np.abs(a - b).max() / scale))

        ok = fwd_err <= 1e-3 and grad_err <= 2e-3
        failures += not ok
        print(f"seed {seed}: fwd max_abs_err {fwd_err:.2e} "
              f"(tol 1e-3), grad max_rel_err {grad_err:.2e} (tol 2e-3) "
              f"{'PASS' if ok else 'FAIL'}")

    print("PALLAS PARITY:", "PASS" if failures == 0 else
          f"FAIL ({failures}/3 seeds)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
