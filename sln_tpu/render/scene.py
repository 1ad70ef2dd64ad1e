"""Differentiable scene assembly + the reference's 70-channel render stack.

Re-implements models/diff_render.py:48-435 as one jittable program:
denormalize boxes -> retrieve meshes -> per-object scale/rotate/translate
into padded static buffers -> near-plane culling -> ONE soft-rasterizer
pass -> [depth | 40 NYU class masks | 29 per-class depth channels], the
exact tensor layout the refinement losses consume
(reference channels: 1 + 40 + len(desired_classes)-3, diff_render.py:434).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sln_tpu.config import CameraConfig, RenderConfig
from sln_tpu.data.vocab import (DO_NOT_RENDER, NYU40_CLASSES,
                                OBJECT_IDX_TO_NAME)
from sln_tpu.render import assets, camera as cam_lib
from sln_tpu.render.rasterizer import face_geometry, soft_rasterize

# ---------------------------------------------------------------------------
# Render-class indexing (diff_render.py:64-74, 372-377): wall first, then
# the sorted remaining classes; depth channels skip wall/floor/ceiling.
# ---------------------------------------------------------------------------
_all = sorted(set(OBJECT_IDX_TO_NAME[1:]) | {"ceiling"})
RENDER_CLASSES: Tuple[str, ...] = tuple(
    ["wall"] + [c for c in _all if c != "wall"])
DEPTH_CLASSES: Tuple[str, ...] = tuple(
    c for c in RENDER_CLASSES if c not in ("wall", "floor", "ceiling"))
NUM_RENDER_CLASSES = len(RENDER_CLASSES)          # 32
NUM_DEPTH_CLASSES = len(DEPTH_CLASSES)            # 29

WALL_RC = RENDER_CLASSES.index("wall")
FLOOR_RC = RENDER_CLASSES.index("floor")
CEIL_RC = RENDER_CLASSES.index("ceiling")

# object-class id -> render-class id (and renderability)
_obj2rc = np.zeros(len(OBJECT_IDX_TO_NAME), np.int32)
_renderable = np.zeros(len(OBJECT_IDX_TO_NAME), bool)
for _i, _name in enumerate(OBJECT_IDX_TO_NAME):
    if _name == "__room__":
        continue
    _obj2rc[_i] = RENDER_CLASSES.index(_name)
    _renderable[_i] = _name not in DO_NOT_RENDER
OBJ_TO_RENDER_CLASS = _obj2rc
OBJ_RENDERABLE = _renderable

# render-class -> NYU-40 channel (40-channel mask block, diff_render.py:429)
RENDER_TO_NYU40 = np.asarray(
    [NYU40_CLASSES.index(c.replace("_", " ")) for c in RENDER_CLASSES],
    np.int32)
_scatter = np.zeros((NUM_RENDER_CLASSES, 40), np.float32)
for _rc, _ny in enumerate(RENDER_TO_NYU40):
    _scatter[_rc, _ny] = 1.0
RC_TO_NYU_MATRIX = _scatter

# depth-channel slot for each render class (-1 = none)
_depth_slot = -np.ones(NUM_RENDER_CLASSES, np.int32)
for _k, _c in enumerate(DEPTH_CLASSES):
    _depth_slot[RENDER_CLASSES.index(_c)] = _k
DEPTH_SLOT = _depth_slot


class SceneBuffers(NamedTuple):
    verts: jnp.ndarray        # (V, 3) world coordinates
    faces: jnp.ndarray        # (F, 3) int32 into verts
    face_class: jnp.ndarray   # (F,) render-class ids
    face_valid: jnp.ndarray   # (F,) bool


class DeviceBank(NamedTuple):
    verts: jnp.ndarray        # (M, Vm, 3)
    faces: jnp.ndarray        # (M, Fm, 3)
    face_valid: jnp.ndarray   # (M, Fm)
    bbox_min: jnp.ndarray     # (M, 3)
    bbox_max: jnp.ndarray     # (M, 3)
    # banked unit-room shells (assets.ShellBank moved to device); entry 0
    # is the procedural exact-fit fallback. Retrieved-shell parity:
    # assets.retrieve_shell_np picks the entry, shell_idx selects it.
    shell_verts: jnp.ndarray  # (S, Vs, 3) in [0, 1]^3
    shell_faces: jnp.ndarray  # (S, Fs, 3)
    shell_part: jnp.ndarray   # (S, Fs) 0=wall 1=floor 2=ceiling
    shell_fvalid: jnp.ndarray  # (S, Fs) bool (bad-wall drops baked in)


def device_bank(bank: assets.MeshBank, shell_subdiv: int = 4,
                shells: assets.ShellBank = None) -> DeviceBank:
    if shells is None:
        shells = assets.procedural_shell_bank(shell_subdiv)
    return DeviceBank(
        verts=jnp.asarray(bank.verts), faces=jnp.asarray(bank.faces),
        face_valid=jnp.asarray(bank.face_valid),
        bbox_min=jnp.asarray(bank.bbox_min),
        bbox_max=jnp.asarray(bank.bbox_max),
        shell_verts=jnp.asarray(shells.verts, jnp.float32),
        shell_faces=jnp.asarray(shells.faces),
        shell_part=jnp.asarray(shells.part),
        shell_fvalid=jnp.asarray(shells.face_valid))


def rotation_y(theta: jnp.ndarray) -> jnp.ndarray:
    """Reference rotation about y (diff_render.py:117-123)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, zero, s], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-s, zero, c], -1)], -2)


def assemble_scene(objs: jnp.ndarray, boxes: jnp.ndarray,
                   angles: jnp.ndarray, obj_mask: jnp.ndarray,
                   model_idx: jnp.ndarray, bank: DeviceBank,
                   shell_idx=0) -> SceneBuffers:
    """objs/boxes(normalized, room row absolute)/angles(float bins)/mask:
    (O, ...) single scene; model_idx: (O,) retrieval result; shell_idx:
    () retrieved room-shell entry (assets.retrieve_shell_np; 0 = the
    procedural exact-fit fallback)."""
    O = objs.shape[0]
    room_mask = (objs == 0) & obj_mask
    room_w = room_mask.astype(boxes.dtype)
    room_dims = jnp.einsum("o,od->d", room_w, boxes)[3:]      # (3,)

    abs_boxes = boxes * jnp.concatenate([room_dims, room_dims])[None]
    bb_min, bb_max = abs_boxes[:, :3], abs_boxes[:, 3:]
    center = (bb_min + bb_max) / 2.0
    size = bb_max - bb_min

    mverts = bank.verts[model_idx]                            # (O, Vm, 3)
    mfaces = bank.faces[model_idx]                            # (O, Fm, 3)
    mf_valid = bank.face_valid[model_idx]                     # (O, Fm)
    msize = bank.bbox_max[model_idx] - bank.bbox_min[model_idx]
    mcenter = (bank.bbox_max[model_idx] + bank.bbox_min[model_idx]) / 2.0

    scale = jnp.min(size / jnp.maximum(msize, 1e-6), axis=-1)  # (O,)
    theta = -angles.astype(jnp.float32) * (2.0 * jnp.pi / 24.0)
    rot = rotation_y(theta)                                    # (O, 3, 3)

    local = mverts - mcenter[:, None]
    world = (scale[:, None, None]
             * jnp.einsum("oij,ovj->ovi", rot, local)
             + center[:, None])                                # (O, Vm, 3)

    renderable = (jnp.asarray(OBJ_RENDERABLE)[objs] & obj_mask
                  & ~room_mask)                                # (O,)
    face_class = jnp.broadcast_to(
        jnp.asarray(OBJ_TO_RENDER_CLASS)[objs][:, None], mf_valid.shape)
    face_valid = mf_valid & renderable[:, None]

    Vm = mverts.shape[1]
    offsets = (jnp.arange(O, dtype=jnp.int32) * Vm)[:, None, None]
    faces_global = mfaces + offsets

    # retrieved room shell (unit-normalized bank entry) scaled to the room
    sidx = jnp.asarray(shell_idx, jnp.int32)
    shell_world = bank.shell_verts[sidx] * room_dims[None]
    shell_faces = bank.shell_faces[sidx] + O * Vm
    spart = bank.shell_part[sidx]
    shell_class = jnp.where(
        spart == 0, WALL_RC,
        jnp.where(spart == 1, FLOOR_RC, CEIL_RC)).astype(jnp.int32)
    shell_valid = bank.shell_fvalid[sidx]

    verts = jnp.concatenate([world.reshape(-1, 3), shell_world], axis=0)
    faces = jnp.concatenate([faces_global.reshape(-1, 3), shell_faces])
    fclass = jnp.concatenate([face_class.reshape(-1), shell_class])
    fvalid = jnp.concatenate([face_valid.reshape(-1), shell_valid])
    return SceneBuffers(verts=verts, faces=faces, face_class=fclass,
                        face_valid=fvalid)


def render_channels(scene: SceneBuffers, room_dims: jnp.ndarray,
                    cfg: RenderConfig) -> jnp.ndarray:
    """Rasterize and build the (1 + 40 + 29, S, S) tensor of
    diff_render.py:366-434."""
    cam = cam_lib.camera_from_room(room_dims, cfg.camera)
    vcam = cam_lib.to_camera(scene.verts, cam)
    v2d_all, z_all = cam_lib.project(vcam, cam)

    tri_v2d = v2d_all[scene.faces]                             # (F, 3, 2)
    tri_z = z_all[scene.faces]                                 # (F, 3)
    # near-plane culling (diff_render.py:345-357, eps=0.06)
    culled = jnp.any(tri_z < cfg.camera.cull_eps, axis=-1)
    valid = scene.face_valid & ~culled

    geom = face_geometry(tri_v2d, tri_z, valid, scene.face_class,
                         near=cfg.camera.near)
    use_pallas = cfg.backend == "pallas" or (
        cfg.backend == "auto"
        and jax.devices()[0].platform == "tpu")
    if use_pallas:
        from sln_tpu.render.rasterizer_pallas import soft_rasterize_pallas
        depth, classes = soft_rasterize_pallas(
            geom, NUM_RENDER_CLASSES, cfg.camera.image_size,
            sigma=cfg.sigma_px, gamma=cfg.gamma, z_far=cfg.z_far)
    else:
        depth, classes = soft_rasterize(
            geom, NUM_RENDER_CLASSES, cfg.camera.image_size,
            sigma=cfg.sigma_px, gamma=cfg.gamma, z_far=cfg.z_far)
    # classes: (S, S, 32) -> channel-major
    classes = jnp.moveaxis(classes, -1, 0)                     # (32, S, S)

    # depth channel: infinity -> -1 (diff_render.py:367)
    depth_out = jnp.where(depth > cfg.camera.depth_clip, -1.0, depth)

    # 40 NYU-40 class-mask channels
    nyu_masks = jnp.einsum("chw,cn->nhw", classes,
                           jnp.asarray(RC_TO_NYU_MATRIX))

    # per-class depth channels (diff_render.py:400-425)
    hard = jax.lax.stop_gradient(classes) > 0.1                # (32, S, S)
    wall_mask = hard[WALL_RC]
    wall_any = wall_mask.any()
    wall_max = jnp.where(
        wall_any, jnp.max(jnp.where(wall_mask, depth, -jnp.inf)), 10.0)
    wall_max = jax.lax.stop_gradient(wall_max)

    counts = hard.sum(axis=(1, 2))                             # (32,)
    sums = (jnp.where(hard, depth[None], 0.0)).sum(axis=(1, 2))
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), wall_max)

    per_class_depth = jnp.where(
        hard, depth[None], means[:, None, None]) / wall_max    # (32, S, S)
    sel = jnp.asarray([RENDER_CLASSES.index(c) for c in DEPTH_CLASSES],
                      jnp.int32)
    depth_channels = per_class_depth[sel]                      # (29, S, S)

    return jnp.concatenate([depth_out[None], nyu_masks, depth_channels],
                           axis=0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_layout(objs, boxes, angles, obj_mask, model_idx,
                  bank: DeviceBank, cfg: RenderConfig,
                  shell_idx=0) -> jnp.ndarray:
    """Single-scene end-to-end: assemble + rasterize + channel stack.

    Returns (70, S, S). vmap over a leading batch axis for batched renders.
    """
    scene = assemble_scene(objs, boxes, angles, obj_mask, model_idx, bank,
                           shell_idx)
    room_mask = (objs == 0) & obj_mask
    room_w = room_mask.astype(boxes.dtype)
    room_dims = jnp.einsum("o,od->d", room_w, boxes)[3:]
    return render_channels(scene, room_dims, cfg)
