#!/usr/bin/env python
"""Offline asset pipeline: SUNCG-style .obj directory -> padded mesh bank.

The TPU replacement for the reference's lazy per-object mesh loading +
PyMesh remeshing (models/misc.py:66-121): parse every model .obj, remesh
with the native C++ edge splitter (sln_tpu/cpp), pad to fixed vertex/face
counts, and save an .npz MeshBank consumable by
sln_tpu.render.assets/scene.

Usage:
  python tools/build_asset_bank.py --obj_dir <dir> --metadata suncg_data_many.json \
      --out bank.npz [--max_len 0.6] [--max_faces 2048]

metadata format (reference metadata/suncg_data_many.json):
  {class_name: [{"id": model_id, "bbox_min": [3], "bbox_max": [3]}, ...]}
with meshes at <obj_dir>/<model_id>/<model_id>.obj.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from sln_tpu import native                          # noqa: E402
from sln_tpu.data.objio import load_obj             # noqa: E402
from sln_tpu.data.vocab import OBJECT_IDX_TO_NAME   # noqa: E402


def build_shells(room_dir: str, wall_metadata_path: str,
                 max_len: float = 0.6, max_faces: int = 4096,
                 max_shells: int = 16):
    """Retrieved wall/floor/ceiling shells -> assets.ShellBank arrays.

    wall_metadata format (reference metadata/wall_data_wfc.json): a list
    of {house_id, model_id, wall_bbox_min/max, floor_bbox_min/max,
    ceiling_bbox_min/max}, with meshes at
    <room_dir>/<house_id>/<model_id>{w,f,c}.obj (reference
    render_room_color.py:267,316,336). Each shell is unit-normalized by
    its wall bbox; the bad-wall vertex drop (diff_render.py:200-213)
    is baked into face_valid in normalized coordinates. Entry 0 is the
    procedural exact-fit shell (fallback when retrieval is off).
    """
    from sln_tpu.render import assets

    with open(wall_metadata_path) as f:
        wall_data = json.load(f)

    entries = [None]  # slot 0 = procedural fallback; sentinel ratio so
    # retrieval always prefers a real shell when any were built
    ratios = [np.array([1e9, 1e9], np.float32)]
    for shell in wall_data[:max_shells - 1]:
        parts = []
        wmin = np.asarray(shell["wall_bbox_min"], np.float64)
        wmax = np.asarray(shell["wall_bbox_max"], np.float64)
        span = np.maximum(wmax - wmin, 1e-9)
        ok = True
        for pid, suffix in ((0, "w"), (1, "f"), (2, "c")):
            path = os.path.join(room_dir, shell["house_id"],
                                shell["model_id"] + suffix + ".obj")
            if not os.path.isfile(path):
                ok = False
                break
            verts, faces = load_obj(path)
            if len(faces) == 0:
                ok = False
                break
            v, fcs = native.split_long_edges(verts, faces,
                                             max_len * float(span.max()))
            v = (v - wmin[None]) / span[None]          # unit-normalize
            parts.append((v.astype(np.float32), fcs, pid))
        if not ok:
            continue
        # concatenate parts into one mesh with per-face part ids
        offs, av, af, ap = 0, [], [], []
        for v, fcs, pid in parts:
            av.append(v)
            af.append(fcs + offs)
            ap.append(np.full(len(fcs), pid, np.int32))
            offs += len(v)
        v = np.concatenate(av)
        fcs = np.concatenate(af)
        pid = np.concatenate(ap)
        if len(fcs) > max_faces:
            tri = v[fcs]
            areas = np.linalg.norm(
                np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]),
                axis=1)
            keep = np.sort(np.argsort(-areas)[:max_faces])
            fcs, pid = fcs[keep], pid[keep]
        # bad-wall drop in normalized coords -> face validity
        part_of_vert = np.zeros(len(v), np.int32)
        for f, p in zip(fcs, pid):
            part_of_vert[f] = p
        drop = assets.shell_wall_drop_normalized(v, part_of_vert)
        fvalid = ~drop[fcs].any(axis=1)
        entries.append({"verts": v, "faces": fcs, "part": pid,
                        "fvalid": fvalid})
        ratios.append(np.array([span[1] / span[0], span[2] / span[0]],
                               np.float32))
        print(f"shell {shell['house_id']}/{shell['model_id']}: "
              f"{len(fcs)} faces, {int(drop.sum())} wall verts dropped")

    proc = assets.procedural_shell_bank(subdiv=4)
    if len(entries) == 1:
        return proc
    vs = max([proc.verts.shape[1]] + [len(e["verts"])
                                      for e in entries[1:]])
    fs = max([proc.faces.shape[1]] + [len(e["faces"])
                                      for e in entries[1:]])
    S = len(entries)
    verts = np.zeros((S, vs, 3), np.float32)
    faces = np.zeros((S, fs, 3), np.int32)
    part = np.zeros((S, fs), np.int32)
    fvalid = np.zeros((S, fs), bool)
    verts[0, :proc.verts.shape[1]] = proc.verts[0]
    faces[0, :proc.faces.shape[1]] = proc.faces[0]
    part[0, :proc.faces.shape[1]] = proc.part[0]
    fvalid[0, :proc.faces.shape[1]] = True
    for i, e in enumerate(entries[1:], start=1):
        nv, nf = len(e["verts"]), len(e["faces"])
        verts[i, :nv] = e["verts"]
        faces[i, :nf] = e["faces"]
        part[i, :nf] = e["part"]
        fvalid[i, :nf] = e["fvalid"]
    return assets.ShellBank(verts=verts, faces=faces, part=part,
                            face_valid=fvalid,
                            ratio=np.stack(ratios))


def build_bank(obj_dir: str, metadata_path: str, out_path: str,
               max_len: float = 0.6, max_faces: int = 2048,
               max_models_per_class: int = 8, room_dir: str = "",
               wall_metadata: str = "") -> None:
    with open(metadata_path) as f:
        metadata = json.load(f)

    entries = []
    for cls_name, models in metadata.items():
        if cls_name not in OBJECT_IDX_TO_NAME:
            continue
        cls_idx = OBJECT_IDX_TO_NAME.index(cls_name)
        for model in models[:max_models_per_class]:
            mid = model["id"]
            path = os.path.join(obj_dir, mid, mid + ".obj")
            if not os.path.isfile(path):
                continue
            verts, faces = load_obj(path)
            if len(faces) == 0:
                continue
            v, fcs = native.split_long_edges(verts, faces, max_len)
            if len(fcs) > max_faces:
                # decimate by dropping smallest triangles beyond the cap
                tri = v[fcs]
                areas = np.linalg.norm(
                    np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]),
                    axis=1)
                keep = np.argsort(-areas)[:max_faces]
                fcs = fcs[np.sort(keep)]
            entries.append({
                "verts": v, "faces": fcs, "class": cls_idx,
                "bbox_min": np.asarray(model["bbox_min"], np.float32),
                "bbox_max": np.asarray(model["bbox_max"], np.float32),
                "id": mid})
            print(f"{cls_name}/{mid}: {len(fcs)} faces")

    if not entries:
        raise SystemExit("no meshes found")
    vm = max(len(e["verts"]) for e in entries)
    fm = max(len(e["faces"]) for e in entries)
    M = len(entries)
    verts = np.zeros((M, vm, 3), np.float32)
    faces = np.zeros((M, fm, 3), np.int32)
    fvalid = np.zeros((M, fm), bool)
    bb_min = np.zeros((M, 3), np.float32)
    bb_max = np.zeros((M, 3), np.float32)
    cls = np.zeros((M,), np.int32)
    ids = []
    for i, e in enumerate(entries):
        nv, nf = len(e["verts"]), len(e["faces"])
        verts[i, :nv] = e["verts"]
        faces[i, :nf] = e["faces"]
        fvalid[i, :nf] = True
        bb_min[i], bb_max[i] = e["bbox_min"], e["bbox_max"]
        cls[i] = e["class"]
        ids.append(e["id"])
    arrays = dict(verts=verts, faces=faces, face_valid=fvalid,
                  bbox_min=bb_min, bbox_max=bb_max, model_class=cls,
                  vm=vm, fm=fm, ids=np.asarray(ids))
    if room_dir and wall_metadata:
        shells = build_shells(room_dir, wall_metadata, max_len)
        arrays.update(
            shell_verts=shells.verts, shell_faces=shells.faces,
            shell_part=shells.part, shell_face_valid=shells.face_valid,
            shell_ratio=shells.ratio)
        print(f"shell bank: {shells.verts.shape[0]} entries "
              "(entry 0 = procedural fallback)")
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path}: {M} models, Vm={vm}, Fm={fm}")


def load_bank_npz(path: str):
    """Load an .npz bank -> (assets.MeshBank, assets.ShellBank or None)."""
    from sln_tpu.render.assets import MeshBank, ShellBank
    d = np.load(path, allow_pickle=False)
    bank = MeshBank(verts=d["verts"], faces=d["faces"],
                    face_valid=d["face_valid"], bbox_min=d["bbox_min"],
                    bbox_max=d["bbox_max"], model_class=d["model_class"],
                    vm=int(d["vm"]), fm=int(d["fm"]))
    shells = None
    if "shell_verts" in d:
        shells = ShellBank(verts=d["shell_verts"], faces=d["shell_faces"],
                           part=d["shell_part"],
                           face_valid=d["shell_face_valid"],
                           ratio=d["shell_ratio"])
    return bank, shells


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--obj_dir", required=True)
    p.add_argument("--metadata", required=True)
    p.add_argument("--out", default="asset_bank.npz")
    p.add_argument("--max_len", default=0.6, type=float)
    p.add_argument("--max_faces", default=2048, type=int)
    p.add_argument("--room_dir", default="",
                   help="SUNCG room dir with <house>/<model>{w,f,c}.obj "
                        "shells (reference render_room_color.py:267)")
    p.add_argument("--wall_metadata", default="",
                   help="wall_data_wfc.json (reference metadata)")
    args = p.parse_args()
    build_bank(args.obj_dir, args.metadata, args.out, args.max_len,
               args.max_faces, room_dir=args.room_dir,
               wall_metadata=args.wall_metadata)
