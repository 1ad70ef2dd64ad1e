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


def build_bank(obj_dir: str, metadata_path: str, out_path: str,
               max_len: float = 0.6, max_faces: int = 2048,
               max_models_per_class: int = 8) -> None:
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
    np.savez_compressed(out_path, verts=verts, faces=faces,
                        face_valid=fvalid, bbox_min=bb_min, bbox_max=bb_max,
                        model_class=cls, vm=vm, fm=fm,
                        ids=np.asarray(ids))
    print(f"wrote {out_path}: {M} models, Vm={vm}, Fm={fm}")


def load_bank_npz(path: str):
    """Load an .npz bank as sln_tpu.render.assets.MeshBank."""
    from sln_tpu.render.assets import MeshBank
    d = np.load(path, allow_pickle=False)
    return MeshBank(verts=d["verts"], faces=d["faces"],
                    face_valid=d["face_valid"], bbox_min=d["bbox_min"],
                    bbox_max=d["bbox_max"], model_class=d["model_class"],
                    vm=int(d["vm"]), fm=int(d["fm"]))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--obj_dir", required=True)
    p.add_argument("--metadata", required=True)
    p.add_argument("--out", default="asset_bank.npz")
    p.add_argument("--max_len", default=0.6, type=float)
    p.add_argument("--max_faces", default=2048, type=int)
    args = p.parse_args()
    build_bank(args.obj_dir, args.metadata, args.out, args.max_len,
               args.max_faces)
