"""Shaded 3D preview of generated layouts — no Blender required.

`test.py --draw_3d` launches the bundled Blender script for photoreal
Cycles renders (reference render/render_room_color.py:29-442). This module
is the TPU-native preview path used when no Blender binary exists (or with
`--renderer preview`): the SAME scene assembly as the Blender script
(scene_spec.scene_meshes — bank meshes, world matrices, retrieved shells
with the bad-wall drop baked in), projected through the framework's
reference camera (render/camera.py, models/diff_render.py:13-46
semantics), rasterized in one soft-rasterizer pass, and shaded on-device:
screen-space normals from the unprojected depth buffer, headlight Lambert
over the ScanNet class palette. Artifacts keep the reference naming
contract `<room>_pred_<kk>_3d.png` (render_caller.py:41) in the same
`data/rendered/` directory the Blender path uses.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from sln_tpu.data.vocab import NYU40_CLASSES
from sln_tpu.render.blender import scene_spec
from sln_tpu.workloads.plot2d import MAPPED_COLORS

_PALETTE = np.asarray(MAPPED_COLORS, np.float32) / 255.0       # (40, 3)


def _world_faces(meshes: List[dict]):
    """Mesh dicts (scene_spec.scene_meshes) -> flat world-space triangle
    soup: verts (V, 3), faces (F, 3) int, face_class (F,) NYU-40 ids.

    The wall/floor/ceiling entries share one vertex array under one
    matrix (disjoint face subsets); dedupe on (id(verts), id(matrix)) so
    the shared shell vertices are transformed and projected once."""
    verts, faces, fcls = [], [], []
    base, seen = 0, {}
    for m in meshes:
        f = np.asarray(m["faces"], np.int64)
        if len(f) == 0:
            continue
        key = (id(m["verts"]), id(m["matrix"]))
        if key in seen:
            off = seen[key]
        else:
            v = np.asarray(m["verts"], np.float64)
            vw = v @ m["matrix"][:3, :3].T + m["matrix"][:3, 3]
            verts.append(vw.astype(np.float32))
            seen[key] = off = base
            base += len(vw)
        faces.append(f + off)
        fcls.append(np.full(len(f), NYU40_CLASSES.index(m["class_name"]),
                            np.int32))
    if not verts:
        return (np.zeros((3, 3), np.float32), np.zeros((1, 3), np.int64),
                np.zeros(1, np.int32))
    return (np.concatenate(verts), np.concatenate(faces),
            np.concatenate(fcls))


def shade(depth: np.ndarray, classes: np.ndarray, focal: float,
          z_far: float, ambient: float = 0.45) -> np.ndarray:
    """(S, S) depth + (S, S, 40) class coverage -> (S, S, 3) RGB [0, 1].

    Albedo is the ScanNet palette color of the winning class; lighting is
    a camera headlight: normals come from central differences of the
    unprojected camera-space positions, intensity = ambient +
    (1-ambient)*|n_z| (faces seen edge-on go dark). Background (no
    coverage / far plane) renders white like the reference's world
    backdrop."""
    S = depth.shape[0]
    cov = classes.sum(-1)
    fg = (cov > 0.5) & (depth < z_far * 0.99)
    albedo = _PALETTE[classes.argmax(-1)]                       # (S, S, 3)

    uv = (np.arange(S, dtype=np.float32) - S / 2.0) / float(focal)
    X = uv[None, :] * depth
    Y = uv[:, None] * depth
    P = np.stack([X, Y, depth], axis=-1)                        # (S, S, 3)
    du = np.gradient(P, axis=1)
    dv = np.gradient(P, axis=0)
    n = np.cross(du, dv)
    nz = np.abs(n[..., 2]) / np.maximum(np.linalg.norm(n, axis=-1), 1e-9)
    # median-filter-ish softening of the |n_z| term is overkill for a
    # preview; raw central differences already look clean at sigma<=0.5
    shadefac = ambient + (1.0 - ambient) * nz
    rgb = albedo * shadefac[..., None]
    return np.where(fg[..., None], rgb, 1.0).astype(np.float32)


def render_preview(objs: List[int], boxes: np.ndarray, angles: np.ndarray,
                   bank=None, shells=None, image_size: int = 256,
                   sigma: float = 0.35, gamma: float = 0.015,
                   z_far: float = 15.0) -> np.ndarray:
    """One predicted layout (data_extracted.json row) -> (S, S, 3) RGB."""
    import jax.numpy as jnp

    from sln_tpu.config import CameraConfig
    from sln_tpu.render import camera as cam_lib
    from sln_tpu.render import rasterizer as rz

    if bank is None:
        bank, shells = scene_spec.load_bank()
    meshes = scene_spec.scene_meshes(objs, boxes, angles, bank, shells)
    verts, faces, fcls = _world_faces(meshes)
    _, dims = scene_spec.denormalize_scene(boxes)
    # an untrained/degenerate model can predict a collapsed or inverted
    # room box; keep the camera finite instead of rendering NaNs
    dims = np.maximum(np.abs(dims), 0.1)

    # bucket the face count (pad with invalid faces) so repeated calls
    # across scenes reuse one compiled rasterizer program per bucket
    F = len(faces)
    Fp = max(512, 1 << int(np.ceil(np.log2(F))))
    pad = Fp - F
    faces = np.concatenate([faces, np.zeros((pad, 3), np.int64)])
    fcls = np.concatenate([fcls, np.zeros(pad, np.int32)])
    fvalid = np.concatenate([np.ones(F, bool), np.zeros(pad, bool)])

    cfg = CameraConfig(image_size=image_size)
    cam = cam_lib.camera_from_room(jnp.asarray(dims, jnp.float32), cfg)
    vc = cam_lib.to_camera(jnp.asarray(verts), cam)
    v2d, z = cam_lib.project(vc, cam)
    tri2d = v2d[faces]                                          # (Fp, 3, 2)
    triz = z[faces]
    valid = (triz > cfg.near).all(-1) & jnp.asarray(fvalid)     # near culling
    geom = rz.face_geometry(tri2d, triz, valid, jnp.asarray(fcls))
    depth, classes = rz.soft_rasterize(geom, len(NYU40_CLASSES),
                                       image_size, sigma=sigma,
                                       gamma=gamma, z_far=z_far)
    return shade(np.asarray(depth), np.asarray(classes),
                 float(cam.focal), z_far)


def run_preview_renders(test_dir: str, rooms: Optional[List[str]] = None,
                        num_preds: int = 4, image_size: int = 256) -> int:
    """Render every predicted layout in <test_dir>/data/data_extracted.json
    to <test_dir>/data/rendered/ (the Blender path's output directory).
    Returns the number of images written."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = os.path.join(test_dir, "data", "rendered")
    os.makedirs(out_dir, exist_ok=True)
    bank, shells = scene_spec.load_bank()
    count = 0
    for room_id, k, objs, boxes, angles in scene_spec.iter_extracted_layouts(
            test_dir, num_preds=num_preds, rooms=rooms):
        rgb = render_preview(objs, boxes, angles, bank, shells,
                             image_size=image_size)
        path = os.path.join(out_dir, scene_spec.color_filename(room_id, k))
        plt.imsave(path, np.clip(rgb, 0.0, 1.0))
        count += 1
        print(f"preview: wrote {path}")
    return count
