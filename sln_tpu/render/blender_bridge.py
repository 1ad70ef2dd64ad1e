"""Optional Blender subprocess bridge (photoreal renders).

The reference shells out to Blender 2.79 for photoreal Cycles renders and
semantic/depth maps (testing/test_plot3d.py:4-8, render/*.py). In this
framework the differentiable rasterizer is the primary mask/depth source
(sln_tpu.workloads.gan_shade) — Blender remains available as an *optional*
host-side tool for photoreal output, invoked exactly like the reference:

    blender -b -P <script> -- <test_dir>

The bridge exports generated layouts (data_extracted.json already matches
the reference schema) and spawns the subprocess when a blender binary is
on PATH; otherwise it raises with a pointer to the rasterizer path.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional


class BlenderNotAvailable(RuntimeError):
    pass


def find_blender(blender_path: Optional[str] = None) -> str:
    if blender_path:
        cand = os.path.join(blender_path, "blender")
        if os.path.isfile(cand):
            return cand
    found = shutil.which("blender")
    if found:
        return found
    raise BlenderNotAvailable(
        "No blender binary found. Photoreal rendering is optional; the "
        "differentiable rasterizer provides semantic masks + depth for the "
        "gan_shade pipeline (sln_tpu.workloads.gan_shade) without Blender.")


def run_blender_script(script_path: str, test_dir: str,
                       blender_path: Optional[str] = None,
                       timeout: int = 3600) -> subprocess.CompletedProcess:
    """`blender -b -P script -- test_dir` (reference test_plot3d.py:4-8)."""
    binary = find_blender(blender_path)
    return subprocess.run(
        [binary, "-b", "-P", script_path, "--", test_dir],
        check=True, timeout=timeout, capture_output=True)


def run_color_render(test_dir: str, blender_path: Optional[str] = None,
                     script: Optional[str] = None):
    """Photoreal Cycles render of generated layouts (reference
    render/render_caller.py -> render_room_color.py). Requires a
    reference-compatible blender-side script."""
    if script is None:
        raise BlenderNotAvailable(
            "Pass the blender-side render script (the reference's "
            "render/render_room_color.py works against "
            "data/data_extracted.json produced by test.py --batch_gen).")
    return run_blender_script(script, test_dir, blender_path)


def run_mask_depth_render(test_dir: str,
                          blender_path: Optional[str] = None,
                          script: Optional[str] = None):
    """Semantic masks + EXR depth via Blender (reference
    render/semantic_depth_caller.py). The rasterizer path
    (gan_shade.layout_channels_to_spade_input) supersedes this; outputs of
    this bridge are consumed by gan_shade.spade_input_from_files."""
    if script is None:
        raise BlenderNotAvailable(
            "Pass the blender-side script (the reference's "
            "render/render_semantic_depth.py). Alternatively use the "
            "rasterizer-backed path: test.py --gan_shade needs no Blender.")
    return run_blender_script(script, test_dir, blender_path)
