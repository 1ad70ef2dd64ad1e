"""Rasterizer-shaded 3D preview (sln_tpu/render/preview.py) — the
--draw_3d backend that needs no Blender binary. Scene assembly is shared
with the Blender scripts (scene_spec.scene_meshes), so these tests cover
the projection + shading + artifact-contract layer on top."""

import json
import os

import numpy as np

from sln_tpu.render import preview
from sln_tpu.render.blender import scene_spec


def _demo_layout():
    """A 2-object room in data_extracted.json's normalized box format
    (last row = absolute room box)."""
    objs = [17, 7, 31]                       # desk, chair, __room__
    boxes = np.array([
        [0.15, 0.0, 0.20, 0.45, 0.35, 0.50],
        [0.55, 0.0, 0.30, 0.80, 0.30, 0.55],
        [0.0, 0.0, 0.0, 4.0, 2.6, 4.5],      # room (absolute)
    ])
    angles = np.array([0.0, 6.0, 0.0])
    return objs, boxes, angles


def test_render_preview_shapes_and_content():
    objs, boxes, angles = _demo_layout()
    rgb = preview.render_preview(objs, boxes, angles, image_size=96)
    assert rgb.shape == (96, 96, 3)
    assert np.isfinite(rgb).all()
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # the room shell + furniture must cover most of the frame (not blank)
    nonwhite = (rgb < 0.98).any(-1).mean()
    assert nonwhite > 0.3, f"only {nonwhite:.2%} of pixels shaded"
    # more than one palette color visible (floor/wall vs furniture)
    colors = np.unique((rgb[(rgb < 0.98).any(-1)] * 8).astype(int), axis=0)
    assert len(colors) > 3


def test_shade_normals_and_background():
    S = 32
    depth = np.full((S, S), 5.0, np.float32)        # flat fronto-parallel
    classes = np.zeros((S, S, 40), np.float32)
    classes[:, :, 3] = 1.0                          # one class everywhere
    rgb = preview.shade(depth, classes, focal=40.0, z_far=15.0)
    # fronto-parallel plane: |n_z| ~ 1 -> full palette brightness
    pal = np.asarray(preview._PALETTE[3])
    np.testing.assert_allclose(rgb[S // 2, S // 2], pal, atol=0.05)
    # no coverage -> white background
    classes2 = np.zeros_like(classes)
    rgb2 = preview.shade(depth, classes2, focal=40.0, z_far=15.0)
    np.testing.assert_allclose(rgb2, 1.0)


def test_run_preview_renders_artifact_contract(tmp_path):
    objs, boxes, angles = _demo_layout()
    data = {"42": {"gt": {"objs": objs, "boxes": boxes.tolist(),
                          "angles": angles.tolist()},
                   "0": {"boxes": boxes.tolist(),
                         "angles": angles.tolist()}}}
    os.makedirs(tmp_path / "data")
    with open(tmp_path / "data" / "data_extracted.json", "w") as f:
        json.dump(data, f)
    n = preview.run_preview_renders(str(tmp_path), image_size=64)
    assert n == 1
    out = tmp_path / "data" / "rendered" / scene_spec.color_filename("42", 0)
    assert out.exists()
