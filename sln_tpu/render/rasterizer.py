"""Differentiable soft rasterizer — pure-JAX reference implementation.

Replaces the Neural Mesh Renderer CUDA extension the reference depends on
(models/diff_render.py:359-431, imported at models/misc.py:7). Where the
reference makes ~37 sequential rasterizer passes per refinement step (one
RGB pass per class with binary per-face textures), this design produces
depth AND all class-probability maps in ONE pass.

Per pixel:

* every face gets a soft coverage  cov_f = sigmoid(d_f / sigma)  from its
  signed pixel distance d_f to the triangle boundary (inside > 0) — the
  soft edge band that carries gradients to vertices (the role of NMR's
  blurred edge gradients);
* faces compete for visibility in a softmax over  log cov_f - z_f / gamma
  (perspective-correct depth z_f; gamma -> 0 = hard z-buffer);
* total opacity  A = 1 - prod_f (1 - cov_f)  alpha-composites the face
  aggregate against the background, so empty pixels return z_far and zero
  class mass. (Keeping coverage inside the visibility softmax cannot work:
  a distance-linear log-sigmoid can never outweigh the z/gamma term, so any
  face would beat the background everywhere.)

    depth   = A * sum_f w_f z_f + (1 - A) * z_far
    class_c = A * sum_f w_f [class_f = c]

The face loop is an online softmax over face chunks (flash-attention
pattern): O(pixels) memory, O(pixels x faces) compute; the class reduction
is a (pixels x faces) @ (faces x classes) matmul for the MXU. The product
of (1 - cov) accumulates exactly as sum of log_sigmoid(-d/sigma). A Pallas
TPU kernel with identical semantics lives in
sln_tpu.render.rasterizer_pallas.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class FaceGeometry(NamedTuple):
    """Per-face screen-space constants, precomputed once per render."""
    v2d: jnp.ndarray        # (F, 3, 2) projected pixel coords
    inv_z: jnp.ndarray      # (F, 3) 1/z of each vertex (camera depth)
    valid: jnp.ndarray      # (F,) bool
    face_class: jnp.ndarray  # (F,) int32
    edge_nx: jnp.ndarray    # (F, 3) edge-function x coefficient
    edge_ny: jnp.ndarray    # (F, 3) edge-function y coefficient
    edge_c: jnp.ndarray     # (F, 3) edge-function offset
    inv_len: jnp.ndarray    # (F, 3) 1 / edge length
    area_sign: jnp.ndarray  # (F,) +-1 winding sign


def face_geometry(v2d: jnp.ndarray, z: jnp.ndarray, valid: jnp.ndarray,
                  face_class: jnp.ndarray, near: float = 1e-3
                  ) -> FaceGeometry:
    """v2d: (F, 3, 2) projected verts; z: (F, 3) camera depths."""
    a, b = v2d, jnp.roll(v2d, -1, axis=1)         # edges a->b
    dx = b[..., 0] - a[..., 0]                     # (F, 3)
    dy = b[..., 1] - a[..., 1]
    # E(p) = dx*(py - ay) - dy*(px - ax)
    edge_nx = -dy
    edge_ny = dx
    edge_c = dy * a[..., 0] - dx * a[..., 1]
    # clamp INSIDE the sqrt: sqrt'(0) = inf would poison the backward pass
    # for degenerate (padded) faces even though they are masked downstream
    length = jnp.sqrt(jnp.maximum(dx * dx + dy * dy, 1e-12))
    inv_len = 1.0 / length
    # twice signed area = E(v2) for edge v0->v1
    area2 = (dx[:, 0] * (v2d[:, 2, 1] - v2d[:, 0, 1])
             - dy[:, 0] * (v2d[:, 2, 0] - v2d[:, 0, 0]))
    area_sign = jnp.where(area2 >= 0, 1.0, -1.0)
    degenerate = jnp.abs(area2) < 1e-9
    behind = jnp.any(z <= near, axis=-1)
    ok = valid & ~degenerate & ~behind
    return FaceGeometry(
        v2d=v2d, inv_z=1.0 / jnp.maximum(z, near), valid=ok,
        face_class=face_class.astype(jnp.int32),
        edge_nx=edge_nx, edge_ny=edge_ny, edge_c=edge_c,
        inv_len=inv_len, area_sign=area_sign)


def _pixel_face_terms(geom: FaceGeometry, px: jnp.ndarray, py: jnp.ndarray,
                      sigma: float, gamma: float):
    """For a (P pixels) x (F faces) block returns
    (visibility logit (P, F), zbuf (P, F), log(1 - cov) (P, F))."""
    # Edge functions E_i(p): (P, F, 3)
    e = (geom.edge_nx[None] * px[:, None, None]
         + geom.edge_ny[None] * py[:, None, None]
         + geom.edge_c[None])
    # signed pixel distance to the boundary: min over edges, inside > 0
    d = jnp.min(e * geom.inv_len[None] * geom.area_sign[None, :, None],
                axis=-1)                                     # (P, F)

    # barycentrics from opposite-edge functions, clamped to the simplex for
    # stable depth extrapolation outside the triangle
    lam = jnp.roll(e, -1, axis=-1)
    lam_sum = jnp.sum(lam, axis=-1, keepdims=True)
    lam = lam / jnp.where(jnp.abs(lam_sum) > 1e-12, lam_sum, 1.0)
    lam = jnp.clip(lam, 0.0, 1.0)
    lam = lam / jnp.maximum(lam.sum(axis=-1, keepdims=True), 1e-12)

    inv_z = jnp.sum(lam * geom.inv_z[None], axis=-1)         # (P, F)
    zbuf = 1.0 / jnp.maximum(inv_z, 1e-12)

    # Coverage argument: LINEAR inside the face (d >= 0, NMR-style edge
    # gradients), QUADRATIC outside — dd = d*(1 + relu(-d))/sigma, C^1 at
    # the boundary. A pure linear d/sigma is unsound: its penalty grows
    # too slowly to ever offset the -z/gamma visibility advantage, so any
    # near-camera face (e.g. an edge-on shell slab) captures pixels
    # arbitrarily far from its footprint (SoftRas, Liu et al. 2019, uses
    # a signed SQUARED distance for the same reason); the quadratic tail
    # bounds that leakage to a ~sqrt(gamma-range * sigma) pixel halo.
    dd = d * (1.0 + jax.nn.relu(-d)) / sigma
    log_cov = jax.nn.log_sigmoid(dd)
    log_one_minus_cov = jax.nn.log_sigmoid(-dd)
    logit = log_cov - zbuf / gamma
    logit = jnp.where(geom.valid[None], logit, NEG_INF)
    log_one_minus_cov = jnp.where(geom.valid[None], log_one_minus_cov, 0.0)
    return logit, zbuf, log_one_minus_cov


def pixel_centers(image_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flattened (S*S,) pixel-center coordinates, row-major."""
    r = jnp.arange(image_size, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(r, r, indexing="ij")
    return px.reshape(-1), py.reshape(-1)


def _composite(w_faces, zbuf, log_transmittance, onehot, z_far):
    """Alpha-composite the face aggregate over the background."""
    alpha = 1.0 - jnp.exp(log_transmittance)                 # (P,)
    depth = alpha * (w_faces * zbuf).sum(-1) + (1.0 - alpha) * z_far
    classes = alpha[:, None] * (w_faces @ onehot)
    return depth, classes


def soft_rasterize_naive(geom: FaceGeometry, num_classes: int,
                         image_size: int, sigma: float, gamma: float,
                         z_far: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct O(P x F) formulation — ground truth for tests."""
    px, py = pixel_centers(image_size)
    logit, zbuf, lomc = _pixel_face_terms(geom, px, py, sigma, gamma)

    m = jnp.max(logit, axis=1, keepdims=True)
    m = jnp.maximum(m, NEG_INF / 2)          # avoid -inf - -inf
    w = jnp.exp(logit - m)
    w = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-30)

    onehot = jax.nn.one_hot(geom.face_class, num_classes, dtype=w.dtype)
    depth, classes = _composite(w, zbuf, lomc.sum(axis=1), onehot, z_far)
    S = image_size
    return depth.reshape(S, S), classes.reshape(S, S, num_classes)


@functools.partial(jax.jit, static_argnames=("num_classes", "image_size",
                                             "chunk"))
def soft_rasterize(geom: FaceGeometry, num_classes: int, image_size: int,
                   sigma: float = 0.5, gamma: float = 0.02,
                   z_far: float = 100.0, chunk: int = 256
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Online-softmax (flash) formulation: O(P) memory.

    Returns (depth (S, S), classes (S, S, C)).
    """
    px, py = pixel_centers(image_size)
    P = px.shape[0]
    F = geom.v2d.shape[0]
    pad = (-F) % chunk
    if pad:
        geom = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0),
            geom)
    nchunks = geom.v2d.shape[0] // chunk
    geom_chunks = jax.tree.map(
        lambda x: x.reshape((nchunks, chunk) + x.shape[1:]), geom)

    init = (jnp.full((P,), NEG_INF / 2),         # m: running max logit
            jnp.zeros((P,)),                     # s: sum exp(l - m)
            jnp.zeros((P,)),                     # acc_z (unnormalized)
            jnp.zeros((P, num_classes)),         # acc_c (unnormalized)
            jnp.zeros((P,)))                     # acc log-transmittance

    @jax.checkpoint
    def body(carry, g):
        m, s, acc_z, acc_c, acc_lt = carry
        logit, zbuf, lomc = _pixel_face_terms(g, px, py, sigma, gamma)
        m_new = jnp.maximum(m, jnp.max(logit, axis=1))
        scale = jnp.exp(m - m_new)
        w = jnp.exp(logit - m_new[:, None])                  # (P, c)
        onehot = jax.nn.one_hot(g.face_class, num_classes, dtype=w.dtype)
        s_new = s * scale + w.sum(axis=1)
        acc_z_new = acc_z * scale + (w * zbuf).sum(axis=1)
        acc_c_new = acc_c * scale[:, None] + w @ onehot
        acc_lt_new = acc_lt + lomc.sum(axis=1)
        return (m_new, s_new, acc_z_new, acc_c_new, acc_lt_new), None

    (m, s, acc_z, acc_c, acc_lt), _ = jax.lax.scan(body, init, geom_chunks)
    denom = jnp.maximum(s, 1e-30)
    alpha = 1.0 - jnp.exp(acc_lt)
    depth = alpha * (acc_z / denom) + (1.0 - alpha) * z_far
    classes = alpha[:, None] * (acc_c / denom[:, None])
    S = image_size
    return depth.reshape(S, S), classes.reshape(S, S, num_classes)
