"""Blender render subsystem: scene math (scene_spec, no bpy needed),
artifact-naming contract against the gan_shade loader, script syntax, and
an end-to-end subprocess run when a blender binary exists (skipped here).

Reference behaviors matched: render/render_room_color.py:29-442 and
render/render_semantic_depth.py:152-454.
"""

import json
import os
import py_compile
import shutil
import subprocess

import numpy as np
import pytest

from sln_tpu.data.vocab import NYU40_CLASSES, OBJECT_IDX_TO_NAME
from sln_tpu.render.blender import scene_spec
from sln_tpu.workloads import gan_shade

BLENDER_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "sln_tpu", "render", "blender")


# ---------------------------------------------------------------------------
# the bpy-dependent files must at least be valid Python
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("fname", ["bpy_scene.py", "driver.py",
                                   "render_color.py",
                                   "render_semantic_depth.py"])
def test_scripts_compile(fname):
    py_compile.compile(os.path.join(BLENDER_DIR, fname), doraise=True)


# ---------------------------------------------------------------------------
# denormalization + transforms
# ---------------------------------------------------------------------------
def test_denormalize_and_height_snap():
    boxes = np.array([
        [0.25, 0.005, 0.25, 0.5, 0.5, 0.5],   # snaps: |y|*H = 0.0125
        [0.1, 0.3, 0.1, 0.4, 0.6, 0.4],       # no snap
        [1.0, 2.0, 3.0, 5.0, 4.5, 7.0],       # room row (absolute)
    ])
    abs_boxes, dims = scene_spec.denormalize_scene(boxes)
    np.testing.assert_allclose(dims, [4.0, 2.5, 4.0])
    # object 0 scaled by dims then snapped to the floor (the threshold
    # applies to the DENORMALIZED y, reference render_room_color.py:167)
    np.testing.assert_allclose(abs_boxes[0, 1], 0.0)
    np.testing.assert_allclose(abs_boxes[0, 4], 0.5 * 2.5 - 0.005 * 2.5)
    # object 1 untouched in y
    np.testing.assert_allclose(abs_boxes[1, 1], 0.3 * 2.5)
    np.testing.assert_allclose(abs_boxes[1, 0], 0.1 * 4.0)


def test_object_world_matrix_places_model_in_box():
    box = np.array([1.0, 0.0, 2.0, 3.0, 1.5, 3.0])
    mmin = np.array([-1.0, 0.0, -0.5])
    mmax = np.array([1.0, 3.0, 0.5])
    m = scene_spec.object_world_matrix(box, angle=0.0,
                                       model_bbox_min=mmin,
                                       model_bbox_max=mmax)
    corners = np.array([[x, y, z] for x in (mmin[0], mmax[0])
                        for y in (mmin[1], mmax[1])
                        for z in (mmin[2], mmax[2])])
    world = corners @ m[:3, :3].T + m[3, :3] * 0 + m[:3, 3]
    # uniform scale = min ratio = min(2/2, 1.5/3, 1/1) = 0.5
    size = world.max(0) - world.min(0)
    np.testing.assert_allclose(size, [1.0, 1.5, 0.5], atol=1e-9)
    # rests on the box bottom (y slack dropped to the floor of the box)
    np.testing.assert_allclose(world.min(0)[1], 0.0, atol=1e-9)
    # centered in x/z
    np.testing.assert_allclose((world.max(0) + world.min(0))[0] / 2, 2.0)
    np.testing.assert_allclose((world.max(0) + world.min(0))[2] / 2, 2.5)


def test_object_world_matrix_rotation():
    box = np.array([0.0, 0.0, 0.0, 2.0, 2.0, 2.0])
    mmin, mmax = np.zeros(3), np.ones(3)
    m = scene_spec.object_world_matrix(box, angle=6.0,  # 6*15 = 90 deg
                                       model_bbox_min=mmin,
                                       model_bbox_max=mmax)
    r = m[:3, :3]
    scale = np.cbrt(np.linalg.det(r))
    np.testing.assert_allclose(scale, 2.0, rtol=1e-9)
    rot = r / scale
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-12)
    # +x maps to +z at 90 degrees about y (reference rotation convention)
    np.testing.assert_allclose(rot @ np.array([1.0, 0, 0]),
                               [0.0, 0.0, 1.0], atol=1e-9)


def test_shell_world_matrices():
    dims = np.array([4.0, 2.5, 5.0])
    mmin = np.array([0.0, 0.0, 0.0])
    mmax = np.array([2.0, 1.0, 2.0])
    # wall: max-ratio uniform scale encloses the room
    m = scene_spec.shell_world_matrix(dims, "wall", mmin, mmax)
    s = m[0, 0]
    assert s == pytest.approx(max(4 / 2, 2.5 / 1, 5 / 2))
    # floor: thin slab fully below y=0
    fmin, fmax = np.array([0, -0.05, 0.]), np.array([2, 0.05, 2.])
    m = scene_spec.shell_world_matrix(dims, "floor", fmin, fmax)
    top = (fmax @ m[:3, :3].T + m[:3, 3])[1]
    assert top == pytest.approx(0.0, abs=1e-9)
    # ceiling: fully above y=H
    m = scene_spec.shell_world_matrix(dims, "ceiling", fmin, fmax)
    bottom = (fmin @ m[:3, :3].T + m[:3, 3])[1]
    assert bottom == pytest.approx(2.5, abs=1e-9)


def test_wall_vertex_drop_heuristic():
    dims = np.array([4.0, 2.5, 5.0])
    # back wall (z=0): kept
    back = np.array([[x, y, 0.0] for x in np.linspace(0, 4, 5)
                     for y in np.linspace(0, 2.5, 3)])
    assert not scene_spec.wall_vertex_drop(back, dims).any()
    # front wall (z=Z): all dropped via the 70% score rule
    front = back.copy()
    front[:, 2] = 5.0
    assert scene_spec.wall_vertex_drop(front, dims).all()
    # interior partition at z=0.5Z: interior x dropped, edge x kept
    mid = np.array([[0.05, 1.0, 2.5], [2.0, 1.0, 2.5], [3.95, 1.0, 2.5]])
    drop = scene_spec.wall_vertex_drop(mid, dims)
    assert list(drop) == [False, True, False]


# ---------------------------------------------------------------------------
# camera sampling
# ---------------------------------------------------------------------------
def test_sample_camera_distribution():
    rng = np.random.default_rng(0)
    dims = np.array([4.0, 2.5, 5.0])
    for _ in range(50):
        xyz, (rx, ry, rz) = scene_spec.sample_camera(rng, dims)
        assert 0.2 * 4 <= xyz[0] <= 0.8 * 4
        assert xyz[1] == pytest.approx(0.9 * 2.5)
        assert xyz[2] == pytest.approx(5.4)
        assert rz == 0.0
        assert -np.pi / 2 < rx < 0          # pitched down
        # yaw turns toward the room center
        assert np.sign(ry) == np.sign(xyz[0] - 2.0) or ry == 0


def test_accept_view():
    assert scene_spec.accept_view(np.full((8, 8), 2.0))
    assert not scene_spec.accept_view(np.full((8, 8), 0.3))
    # invalid (background) pixels are excluded from the mean
    z = np.full((8, 8), 1e10)
    z[0, 0] = 2.0
    assert scene_spec.accept_view(z)
    assert not scene_spec.accept_view(np.full((8, 8), np.inf))


# ---------------------------------------------------------------------------
# artifact naming contract vs the gan_shade loader
# ---------------------------------------------------------------------------
def test_mask_names_round_trip_through_loader_parse():
    classes = scene_spec.mask_classes_for(list(range(1, 32)))
    assert {"wall", "floor", "ceiling"} <= set(classes)
    classes_us = [c.replace(" ", "_") for c in NYU40_CLASSES]
    name = scene_spec.pred_name("33433", 1)
    assert name == "33433_pred_01"
    for cls in classes:
        fname = scene_spec.mask_filename(name, cls)
        stem = os.path.basename(fname).split(".")[0]
        parsed = gan_shade.mask_class_from_stem(stem)
        assert parsed == cls.replace(" ", "_")
        assert parsed in classes_us
    assert scene_spec.depth_filename(name).endswith("_depth.exr")
    assert scene_spec.color_filename("7", 0) == "7_pred_00_3d.png"


def test_spade_input_from_files_round_trip(tmp_path):
    """Write the semantic-masks artifact set (npy depth sidecar + mask
    PNGs) exactly as render_semantic_depth.py would, read it back with
    the gan_shade loader, and check the 41-channel stack."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    name = scene_spec.pred_name("42", 0)
    size = 64
    rng = np.random.default_rng(0)
    depth = rng.uniform(1.0, 3.0, (size, size)).astype(np.float32)
    np.save(tmp_path / scene_spec.depth_filename(name).replace(
        ".exr", ".npy"), depth)
    bed_mask = np.zeros((size, size), np.float32)
    bed_mask[10:30, 10:30] = 1.0
    wall_mask = np.ones((size, size), np.float32)
    for cls, mask in (("bed", bed_mask), ("wall", wall_mask),
                      ("floor mat", bed_mask)):
        plt.imsave(tmp_path / scene_spec.mask_filename(name, cls),
                   np.stack([mask] * 3, -1))
    # decoys that must be ignored
    plt.imsave(tmp_path / scene_spec.orig_filename(name),
               np.zeros((8, 8, 3)))

    total = gan_shade.spade_input_from_files(str(tmp_path), room="42")
    assert total.shape == (size, size, 41)
    d = total[..., 0]
    assert d.min() >= -1.0 - 1e-6 and d.max() <= 1.0 + 1e-6
    classes_us = [c.replace(" ", "_") for c in NYU40_CLASSES]
    np.testing.assert_array_equal(
        total[..., 1 + classes_us.index("bed")], bed_mask)
    np.testing.assert_array_equal(
        total[..., 1 + classes_us.index("wall")], wall_mask)
    np.testing.assert_array_equal(
        total[..., 1 + classes_us.index("floor_mat")], bed_mask)
    # absent classes come back empty
    assert total[..., 1 + classes_us.index("sofa")].sum() == 0


# ---------------------------------------------------------------------------
# scene assembly from data_extracted.json
# ---------------------------------------------------------------------------
def _write_extracted(tmp_path, room_id="7"):
    boxes = [[0.2, 0.0, 0.2, 0.5, 0.3, 0.5],
             [0.5, 0.0, 0.5, 0.9, 0.4, 0.8],
             [0.0, 0.0, 0.0, 4.0, 2.5, 5.0]]
    angles = [0.0, 6.0, 0.0]
    objs = [OBJECT_IDX_TO_NAME.index("bed"),
            OBJECT_IDX_TO_NAME.index("desk"), 0]
    data = {room_id: {
        "gt": {"objs": objs, "boxes": boxes, "angles": angles,
               "triples": []},
        "0": {"boxes": boxes, "angles": angles},
        "1": {"boxes": boxes, "angles": angles},
    }}
    os.makedirs(tmp_path / "data", exist_ok=True)
    with open(tmp_path / "data" / "data_extracted.json", "w") as f:
        json.dump(data, f)
    return objs, boxes


def test_iter_extracted_and_scene_meshes(tmp_path):
    objs, boxes = _write_extracted(tmp_path)
    items = list(scene_spec.iter_extracted_layouts(str(tmp_path)))
    assert [it[1] for it in items] == [0, 1]
    room_id, k, o, b, a = items[0]
    assert o == objs

    bank, shells = scene_spec.load_bank()
    meshes = scene_spec.scene_meshes(o, b, a, bank, shells)
    names = {m["name"] for m in meshes}
    assert {"wall", "floor", "ceiling"} <= names
    assert any("bed" in n for n in names)
    classes = {m["class_name"] for m in meshes}
    assert "bed" in classes and "desk" in classes
    # placed bed mesh stays inside its absolute box (+eps)
    bed = next(m for m in meshes if "bed" in m["name"])
    world = bed["verts"] @ bed["matrix"][:3, :3].T + bed["matrix"][:3, 3]
    abs_boxes, dims = scene_spec.denormalize_scene(np.asarray(b))
    lo, hi = abs_boxes[0, :3], abs_boxes[0, 3:]
    assert (world.min(0) >= lo - 1e-6).all()
    assert (world.max(0) <= hi + 1e-6).all()
    # every face references valid vertices
    for m in meshes:
        assert m["faces"].max() < len(m["verts"])


def test_retrieval_numpy_matches_jax(tmp_path):
    import jax.numpy as jnp
    from sln_tpu.render import assets

    bank = assets.build_procedural_bank(subdiv=1)
    rng = np.random.default_rng(1)
    objs = np.array([9, 12, 30, 11, 28], np.int32)
    boxes = rng.uniform(0.5, 3.0, (5, 6)).astype(np.float32)
    boxes[:, 3:] = boxes[:, :3] + rng.uniform(0.5, 2.0, (5, 3))
    got = scene_spec.retrieve_models_np(objs, boxes, bank)
    want = np.asarray(assets.retrieve_models(jnp.asarray(objs),
                                             jnp.asarray(boxes), bank))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# full subprocess run (needs a blender binary; auto-skipped without one)
# ---------------------------------------------------------------------------
@pytest.mark.skipif(shutil.which("blender") is None,
                    reason="no blender binary on PATH")
def test_blender_semantic_depth_end_to_end(tmp_path):
    _write_extracted(tmp_path)
    env = dict(os.environ, SLN_TPU_RENDER_K="0")
    subprocess.run(
        ["blender", "-b", "-P",
         os.path.join(BLENDER_DIR, "render_semantic_depth.py"), "--",
         str(tmp_path)], check=True, timeout=1200, env=env)
    out = tmp_path / "data" / "semantic_masks"
    files = os.listdir(out)
    name = scene_spec.pred_name("7", 0)
    assert scene_spec.depth_filename(name) in files
    assert scene_spec.orig_filename(name) in files
    assert scene_spec.mask_filename(name, "bed") in files
    total = gan_shade.spade_input_from_files(str(out), room="7")
    assert total.shape[-1] == 41
    classes_us = [c.replace(" ", "_") for c in NYU40_CLASSES]
    assert total[..., 1 + classes_us.index("bed")].sum() > 0
