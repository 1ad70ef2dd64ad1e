"""Blender-side rendering subsystem (reference render/ directory).

Self-contained, modern-Blender (>= 3.x bpy API) re-implementation of the
reference's Blender-2.79 render scripts:

* ``render_color.py``          — photoreal Cycles renders of generated
                                 layouts (reference render/render_caller.py
                                 -> render_room_color.py:29-442)
* ``render_semantic_depth.py`` — per-class binary masks + EXR depth for
                                 SPADE (reference
                                 render/semantic_depth_caller.py ->
                                 render_semantic_depth.py:152-454)
* ``bpy_scene.py``             — the bpy helper library (camera, lights,
                                 Cycles config, z-buffer readback, mask
                                 rendering; reference
                                 render/xiuminglib/blender/)
* ``scene_spec.py``            — ALL scene math (box denorm, transforms,
                                 wall heuristics, camera sampling, artifact
                                 naming) in pure numpy so it is unit-tested
                                 without a Blender binary.

Both entry scripts run as ``blender -b -P <script> -- <test_dir>`` — the
exact subprocess contract of the reference (testing/test_plot3d.py:4-8) —
and consume ``<test_dir>/data/data_extracted.json`` produced by
``test.py --batch_gen``. Meshes come from the procedural asset bank (or a
real .npz bank via SLN_TPU_ASSET_BANK), fed to Blender as raw
vertex/face arrays: no .obj importer or SUNCG checkout needed.
"""
