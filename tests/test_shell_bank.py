"""Retrieved room-shell bank: build from .obj shells (the reference's
wall/floor/ceiling retrieval, models/misc.py:123-191 +
render_room_color.py:260-345), bad-wall drop, retrieval, and rendering
through the jitted scene path with shell_idx."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from sln_tpu.render import assets


def _write_box_obj(path, bmin, bmax):
    """Axis-aligned box as an .obj (12 tris)."""
    bmin, bmax = np.asarray(bmin, float), np.asarray(bmax, float)
    corners = np.array([[x, y, z] for x in (bmin[0], bmax[0])
                        for y in (bmin[1], bmax[1])
                        for z in (bmin[2], bmax[2])])
    quads = [(0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5)]
    with open(path, "w") as f:
        for c in corners:
            f.write(f"v {c[0]} {c[1]} {c[2]}\n")
        for a, b, c, d in quads:
            f.write(f"f {a+1} {b+1} {c+1}\n")
            f.write(f"f {a+1} {c+1} {d+1}\n")


@pytest.fixture(scope="module")
def shell_bank(tmp_path_factory):
    from tools.build_asset_bank import build_shells

    tmp = tmp_path_factory.mktemp("shells")
    meta = []
    for i, dims in enumerate([(4.0, 2.5, 5.0), (3.0, 3.0, 3.0)]):
        house = tmp / f"house{i}"
        os.makedirs(house)
        X, Y, Z = dims
        _write_box_obj(house / f"room{i}w.obj", (0, 0, 0), dims)
        _write_box_obj(house / f"room{i}f.obj", (0, -0.1, 0), (X, 0, Z))
        _write_box_obj(house / f"room{i}c.obj", (0, Y, 0), (X, Y + 0.1, Z))
        meta.append({
            "house_id": f"house{i}", "model_id": f"room{i}",
            "wall_bbox_min": [0, 0, 0], "wall_bbox_max": list(dims),
            "floor_bbox_min": [0, -0.1, 0], "floor_bbox_max": [X, 0, Z],
            "ceiling_bbox_min": [0, Y, 0],
            "ceiling_bbox_max": [X, Y + 0.1, Z]})
    meta_path = tmp / "wall_data_wfc.json"
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return build_shells(str(tmp), str(meta_path), max_len=0.4)


def test_shell_bank_structure(shell_bank):
    s = shell_bank
    assert s.verts.shape[0] == 3              # procedural + 2 retrieved
    assert s.ratio.shape == (3, 2)
    np.testing.assert_allclose(s.ratio[1], [2.5 / 4.0, 5.0 / 4.0],
                               rtol=1e-6)
    np.testing.assert_allclose(s.ratio[2], [1.0, 1.0], rtol=1e-6)
    # normalized into the unit cube (floor/ceiling slabs poke out in y)
    for i in (1, 2):
        v = s.verts[i]
        used = np.zeros(len(v), bool)
        used[s.faces[i][s.part[i] >= 0].reshape(-1)] = True
        assert v[used][:, [0, 2]].min() >= -1e-6
        assert v[used][:, [0, 2]].max() <= 1.0 + 1e-6
    # every retrieved entry keeps some valid faces per part
    for i in (1, 2):
        for pid in (0, 1, 2):
            sel = (s.part[i] == pid) & s.face_valid[i]
            assert sel.any(), (i, pid)


def test_bad_wall_faces_dropped(shell_bank):
    """Front-wall faces (z ~ 1 in normalized coords) must be invalid;
    back-wall faces stay."""
    s = shell_bank
    i = 1
    wall = s.part[i] == 0
    centers = s.verts[i][s.faces[i]].mean(axis=1)       # (Fs, 3)
    front_interior = (wall & (centers[:, 2] > 0.9)
                      & (centers[:, 0] > 0.2) & (centers[:, 0] < 0.8))
    # strictly-back-plane faces (every vertex at z < 0.1; cap faces that
    # reach into z > 0.2 legitimately lose vertices to the heuristic);
    # exclude (0,0,0) pad faces
    zmax = s.verts[i][s.faces[i]][..., 2].max(axis=1)
    nondeg = (s.faces[i][:, 0] != s.faces[i][:, 1])
    back = wall & nondeg & (zmax < 0.1)
    assert front_interior.any()
    assert not s.face_valid[i][front_interior].any()
    assert back.any() and s.face_valid[i][back].all()


def test_shell_retrieval(shell_bank):
    # exact-ratio room picks its own shell
    assert assets.retrieve_shell_np([4.0, 2.5, 5.0], shell_bank) == 1
    assert assets.retrieve_shell_np([2.0, 2.0, 2.0], shell_bank) == 2


def test_wall_drop_normalized_rules():
    # 70% rule: a pure front wall is dropped entirely
    v = np.array([[x, y, 0.95] for x in np.linspace(0, 1, 5)
                  for y in np.linspace(0, 1, 3)])
    part = np.zeros(len(v), np.int32)
    assert assets.shell_wall_drop_normalized(v, part).all()
    # floor vertices never dropped
    part_floor = np.ones(len(v), np.int32)
    assert not assets.shell_wall_drop_normalized(v, part_floor).any()


def test_render_layout_with_retrieved_shell(shell_bank):
    """The jitted render path consumes the retrieved shell: the near
    (front) wall must not occlude the camera, and outputs must differ
    from the procedural-shell render only moderately."""
    import jax
    from sln_tpu.config import CameraConfig, RenderConfig
    from sln_tpu.render import scene as scene_lib

    bank_host = assets.build_procedural_bank(subdiv=1)
    bank = scene_lib.device_bank(bank_host, shells=shell_bank)
    cfg = RenderConfig(camera=CameraConfig(image_size=48), mesh_subdiv=1)

    O = 6
    objs = jnp.asarray([30, 9, 0, 0, 0, 0], jnp.int32)   # bed, chair, room
    objs = objs.at[2].set(0)
    mask = jnp.asarray([True, True, True, False, False, False])
    boxes = jnp.asarray([
        [0.2, 0.0, 0.2, 0.5, 0.3, 0.5],
        [0.6, 0.0, 0.6, 0.8, 0.25, 0.8],
        [0.0, 0.0, 0.0, 4.0, 2.5, 5.0],
        [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0],
    ], jnp.float32)
    angles = jnp.zeros((O,), jnp.float32)
    dims = np.array([4.0, 2.5, 5.0])
    abs_boxes = np.asarray(boxes) * np.concatenate([dims, dims])[None]
    midx = assets.retrieve_models(objs, jnp.asarray(abs_boxes), bank_host)

    sidx = assets.retrieve_shell_np(dims, shell_bank)
    assert sidx == 1
    out_retr = scene_lib.render_layout(objs, boxes, angles, mask, midx,
                                       bank, cfg, shell_idx=sidx)
    out_proc = scene_lib.render_layout(objs, boxes, angles, mask, midx,
                                       bank, cfg, shell_idx=0)
    from sln_tpu.data.vocab import NYU40_CLASSES
    for out in (out_retr, out_proc):
        assert out.shape[0] == 70
        assert bool(jnp.isfinite(out).all())
        # scene visible: some valid depth, wall and floor pixels
        assert float((out[0] > 0).mean()) > 0.5
        assert float(out[1 + NYU40_CLASSES.index("wall")].max()) > 0.5
        assert float(out[1 + NYU40_CLASSES.index("floor")].max()) > 0.5
    # the retrieved slab ceiling is visible (the procedural ceiling plane
    # has a near-camera cull hole, so the two renders legitimately differ
    # in coverage; each must be individually sane)
    assert float(out_retr[1 + NYU40_CLASSES.index("ceiling")].max()) > 0.5
    # the slab shell covers the near-camera cull holes the procedural
    # plane shell has (faces touching the near plane are culled whole,
    # diff_render.py:345-357), so it leaks less background: more valid
    # depth pixels and fewer background-blended (depth near z_far) ones
    d1, d2 = np.asarray(out_retr[0]), np.asarray(out_proc[0])
    assert (d1 > 0).mean() >= (d2 > 0).mean() - 0.02
    assert (d1 > 8.0).mean() <= (d2 > 8.0).mean() + 0.02
