"""End-to-end asset pipeline on a realistic SUNCG-style .obj corpus:
multi-submesh models (o/g groups, quads, v/vt/vn face indices, mtl
headers) + wall/floor/ceiling room shells -> tools/build_asset_bank.py ->
.npz -> device bank -> a full refinement step on the retrieved meshes.

Mirrors the reference's lazy PyWavefront + PyMesh loading contract
(models/misc.py:34-121) at build time instead of render time.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sln_tpu.data.objio import load_obj
from sln_tpu.render import assets


def _emit_box(f, bmin, bmax, vbase, part_name):
    """One axis-aligned box part: 8 v (+vt/vn), 6 quad faces written with
    the full v/vt/vn index syntax PyWavefront-era SUNCG assets use."""
    bmin, bmax = np.asarray(bmin, float), np.asarray(bmax, float)
    f.write(f"o {part_name}\n")
    corners = [[x, y, z] for x in (bmin[0], bmax[0])
               for y in (bmin[1], bmax[1]) for z in (bmin[2], bmax[2])]
    for c in corners:
        f.write(f"v {c[0]:.6f} {c[1]:.6f} {c[2]:.6f}\n")
    for u, v in ((0, 0), (0, 1), (1, 1), (1, 0)):
        f.write(f"vt {u} {v}\n")
    for n in ((0, 1, 0), (0, -1, 0), (1, 0, 0)):
        f.write(f"vn {n[0]} {n[1]} {n[2]}\n")
    quads = [(0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5)]
    for a, b, c, d in quads:
        f.write("f {0}/1/1 {1}/2/2 {2}/3/3 {3}/4/1\n".format(
            vbase + a + 1, vbase + b + 1, vbase + c + 1, vbase + d + 1))
    return vbase + 8


def _write_furniture_obj(path, parts):
    """Multi-part furniture mesh: parts = [(name, bmin, bmax), ...]."""
    with open(path, "w") as f:
        f.write("# SUNCG-style object\nmtllib model.mtl\n")
        vbase = 0
        for name, bmin, bmax in parts:
            f.write(f"usemtl {name}_mat\n")
            vbase = _emit_box(f, bmin, bmax, vbase, name)


FIXTURE_MODELS = {
    # class -> list of (model_id, parts). Dims are SUNCG-ish meters, Y-up.
    "bed": [("bed_101", [
        ("frame", (0, 0.2, 0), (2.0, 0.5, 1.6)),
        ("mattress", (0.05, 0.5, 0.05), (1.95, 0.75, 1.55)),
        ("leg_fl", (0.0, 0.0, 0.0), (0.1, 0.2, 0.1)),
        ("leg_fr", (1.9, 0.0, 0.0), (2.0, 0.2, 0.1)),
        ("leg_bl", (0.0, 0.0, 1.5), (0.1, 0.2, 1.6)),
        ("leg_br", (1.9, 0.0, 1.5), (2.0, 0.2, 1.6)),
        ("headboard", (0, 0.5, 0), (2.0, 1.1, 0.08))])],
    "chair": [("chair_7", [
        ("seat", (0, 0.4, 0), (0.5, 0.48, 0.5)),
        ("back", (0, 0.48, 0.42), (0.5, 1.0, 0.5)),
        ("leg_a", (0.02, 0, 0.02), (0.08, 0.4, 0.08)),
        ("leg_b", (0.42, 0, 0.42), (0.48, 0.4, 0.48))])],
    "table": [("table_33", [
        ("top", (0, 0.7, 0), (1.4, 0.76, 0.8)),
        ("leg_a", (0.05, 0, 0.05), (0.12, 0.7, 0.12)),
        ("leg_b", (1.28, 0, 0.68), (1.35, 0.7, 0.75))])],
    "sofa": [("sofa_2", [
        ("base", (0, 0.1, 0), (1.8, 0.45, 0.9)),
        ("back", (0, 0.45, 0.7), (1.8, 0.9, 0.9)),
        ("arm_l", (0, 0.45, 0), (0.15, 0.65, 0.9)),
        ("arm_r", (1.65, 0.45, 0), (1.8, 0.65, 0.9))])],
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """<obj_dir>/<mid>/<mid>.obj corpus + suncg_data_many.json metadata +
    room shells + wall_data_wfc.json (full reference directory layout)."""
    tmp = tmp_path_factory.mktemp("suncg_assets")
    obj_dir = tmp / "object"
    metadata = {}
    for cls, models in FIXTURE_MODELS.items():
        metadata[cls] = []
        for mid, parts in models:
            d = obj_dir / mid
            os.makedirs(d)
            _write_furniture_obj(d / f"{mid}.obj", parts)
            lo = np.min([p[1] for p in parts], axis=0)
            hi = np.max([p[2] for p in parts], axis=0)
            metadata[cls].append({"id": mid, "bbox_min": lo.tolist(),
                                  "bbox_max": hi.tolist()})
    # a metadata entry whose mesh is missing must be skipped, not fatal
    metadata["chair"].append({"id": "chair_missing",
                              "bbox_min": [0, 0, 0], "bbox_max": [1, 1, 1]})
    meta_path = tmp / "suncg_data_many.json"
    with open(meta_path, "w") as f:
        json.dump(metadata, f)

    room_dir = tmp / "room"
    wall_meta = []
    for i, dims in enumerate([(4.0, 2.6, 5.0)]):
        house = room_dir / f"house{i}"
        os.makedirs(house)
        X, Y, Z = dims
        for suffix, lo, hi in (("w", (0, 0, 0), dims),
                               ("f", (0, -0.08, 0), (X, 0, Z)),
                               ("c", (0, Y, 0), (X, Y + 0.08, Z))):
            with open(house / f"fr_0rm_{i}{suffix}.obj", "w") as f:
                _emit_box(f, lo, hi, 0, suffix)
        wall_meta.append({
            "house_id": f"house{i}", "model_id": f"fr_0rm_{i}",
            "wall_bbox_min": [0, 0, 0], "wall_bbox_max": list(dims),
            "floor_bbox_min": [0, -0.08, 0], "floor_bbox_max": [X, 0, Z],
            "ceiling_bbox_min": [0, Y, 0],
            "ceiling_bbox_max": [X, Y + 0.08, Z]})
    wall_path = tmp / "wall_data_wfc.json"
    with open(wall_path, "w") as f:
        json.dump(wall_meta, f)
    return {"obj_dir": str(obj_dir), "metadata": str(meta_path),
            "room_dir": str(room_dir), "wall_metadata": str(wall_path),
            "tmp": tmp}


@pytest.fixture(scope="module")
def built_bank(corpus):
    from tools.build_asset_bank import build_bank, load_bank_npz

    out = str(corpus["tmp"] / "bank.npz")
    build_bank(corpus["obj_dir"], corpus["metadata"], out,
               max_len=0.35, max_faces=512,
               room_dir=corpus["room_dir"],
               wall_metadata=corpus["wall_metadata"])
    return load_bank_npz(out)


def test_multisubmesh_obj_io(corpus):
    """v/vt/vn quad faces fan-triangulate; all parts land in one mesh."""
    path = os.path.join(corpus["obj_dir"], "bed_101", "bed_101.obj")
    verts, faces = load_obj(path)
    assert verts.shape == (7 * 8, 3)             # 7 parts x 8 corners
    assert faces.shape == (7 * 12, 3)            # 6 quads -> 12 tris each
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_bank_structure(built_bank):
    from sln_tpu.data.vocab import OBJECT_IDX_TO_NAME

    bank, shells = built_bank
    assert bank.verts.shape[0] == 4              # one model per class
    names = [OBJECT_IDX_TO_NAME[c] for c in bank.model_class]
    assert sorted(names) == ["bed", "chair", "sofa", "table"]
    # remesher ran: every valid face's edges respect max_len
    for m in range(4):
        fcs = bank.faces[m][bank.face_valid[m]]
        tri = bank.verts[m][fcs]
        edges = np.linalg.norm(
            tri - np.roll(tri, 1, axis=1), axis=2)
        assert edges.max() <= 0.35 + 1e-5
        assert len(fcs) <= 512                   # decimation cap held
    # bbox metadata preserved for retrieval scoring
    bed = list(bank.model_class).index(
        OBJECT_IDX_TO_NAME.index("bed"))
    np.testing.assert_allclose(bank.bbox_max[bed], [2.0, 1.1, 1.6],
                               atol=1e-6)
    # shells: procedural fallback at 0 + the retrieved room
    assert shells is not None and shells.verts.shape[0] == 2
    np.testing.assert_allclose(shells.ratio[1], [2.6 / 4.0, 5.0 / 4.0],
                               rtol=1e-6)


def test_retrieval_picks_matching_class_and_size(built_bank):
    from sln_tpu.data.vocab import OBJECT_IDX_TO_NAME

    bank, _ = built_bank
    bed_cls = OBJECT_IDX_TO_NAME.index("bed")
    chair_cls = OBJECT_IDX_TO_NAME.index("chair")
    objs = jnp.asarray([bed_cls, chair_cls], jnp.int32)
    boxes_abs = jnp.asarray([[0, 0, 0, 2.0, 1.0, 1.6],
                             [0, 0, 0, 0.5, 1.0, 0.5]], jnp.float32)
    midx = np.asarray(assets.retrieve_models(objs, boxes_abs, bank))
    assert bank.model_class[midx[0]] == bed_cls
    assert bank.model_class[midx[1]] == chair_cls


def test_refinement_step_on_built_bank(built_bank):
    """One full refinement iteration (render + grad + optimizer update)
    driven end-to-end by the corpus-built bank, retrieved shell included."""
    import dataclasses as dc

    from sln_tpu.config import DataConfig, default_config
    from sln_tpu.data.augment import build_graphs
    from sln_tpu.models.vae import Sg2ScVAE
    from sln_tpu.render import scene as scene_lib
    from sln_tpu.workloads import common, refine

    bank_host, shells = built_bank
    cfg = default_config().replace(
        data=DataConfig(max_objects=12, max_triples=36, max_on_rels=12))
    cfg = cfg.replace(refine=dc.replace(cfg.refine, render_size=32,
                                        num_iters=2))
    val_arrays, size_info = common.load_arrays(8, cfg, synthetic_seed=23)
    batch = build_graphs(
        jax.random.PRNGKey(0), jnp.asarray(val_arrays["objs"][:1]),
        jnp.asarray(val_arrays["boxes"][:1]),
        jnp.asarray(val_arrays["angles"][:1]),
        jnp.asarray(val_arrays["obj_mask"][:1]),
        jnp.asarray(val_arrays["room_ids"][:1]), size_info,
        max_on_rels=12)
    model = Sg2ScVAE(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    bank = scene_lib.device_bank(bank_host, shells=shells)
    rcfg = dc.replace(cfg.render, camera=dc.replace(
        cfg.render.camera, image_size=32))
    midx, target, size_t, room_row = refine.prepare_refine_inputs(
        batch, bank_host, bank, rcfg)
    assert np.isfinite(np.asarray(target)).all()
    assert float(jnp.asarray(target)[0, 0].max()) > 0   # scene visible
    tx, step, _, _ = refine.make_refine_step(
        model, variables.get("batch_stats", {}), batch, midx, bank,
        target, size_t, room_row, cfg)
    z0 = jnp.zeros((1, batch.max_objects, cfg.model.latent_dim))
    opt = tx.init((z0, variables["params"]))
    state = refine.RefineState(z0, variables["params"], opt,
                               jnp.zeros((), jnp.int32))
    state, aux = step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["total"]))
    assert np.isfinite(np.asarray(state.z)).all()
    assert float(jnp.abs(state.z - z0).max()) > 0       # z actually moved
