"""batch_gen workload: posterior cache + 4 sampled layouts per val room.

Reference: testing/test_VAE.py:9-119 (`test.py --batch_gen`). Artifact
parity: writes `<test_dir>/mean_cov.pkl` and
`<test_dir>/data/data_extracted.json` with per-room 'gt' + '0'..'3'
predicted layouts.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from sln_tpu.data.augment import SizeInfo, build_graphs
from sln_tpu.workloads import posterior

NSAMPLE = 4  # reference test_VAE.py:71


def run_batch_gen(model, variables, train_arrays: Dict[str, np.ndarray],
                  val_arrays: Dict[str, np.ndarray], size_info: SizeInfo,
                  cfg, test_dir: str, batch_size: int = 256) -> str:
    import jax
    import jax.numpy as jnp

    from sln_tpu.models.vae import Sg2ScVAE

    test_data_dir = os.path.join(test_dir, "data")
    os.makedirs(test_data_dir, exist_ok=True)

    mean, cov = posterior.get_or_compute_mean_cov(
        model, variables, train_arrays, size_info, cfg, test_dir)

    @jax.jit
    def decode_samples(key, objs, boxes, angles, mask, room_ids):
        kg, kz = jax.random.split(key)
        batch = build_graphs(kg, objs, boxes, angles, mask, room_ids,
                             size_info, max_on_rels=cfg.data.max_on_rels,
                             use_attr_30=cfg.data.use_attr_30)
        B, O = objs.shape
        z = posterior.sample_z(kz, mean, cov, (NSAMPLE, B, O))
        def dec(zk):
            bx, ap = model.apply(variables, zk, batch, False,
                                 method=Sg2ScVAE.decode)
            return bx, jnp.argmax(ap, axis=-1)
        boxes_pred, angles_pred = jax.vmap(dec)(z)
        return batch, boxes_pred, angles_pred

    data = {}
    n = val_arrays["objs"].shape[0]
    key = jax.random.PRNGKey(7)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        pad = batch_size - len(idx)
        if pad:
            idx = np.concatenate([idx, np.zeros(pad, np.int64)])
        batch, boxes_pred, angles_pred = decode_samples(
            jax.random.fold_in(key, start),
            val_arrays["objs"][idx], val_arrays["boxes"][idx],
            val_arrays["angles"][idx], val_arrays["obj_mask"][idx],
            val_arrays["room_ids"][idx])
        take = batch_size - pad
        objs = np.asarray(batch.objs)[:take]
        mask = np.asarray(batch.obj_mask)[:take]
        tmask = np.asarray(batch.triple_mask)[:take]
        triples = np.asarray(batch.triples)[:take]
        gt_boxes = np.asarray(batch.boxes)[:take]
        gt_angles = np.asarray(batch.angles)[:take]
        room_ids = np.asarray(batch.room_ids)[:take]
        bp = np.asarray(boxes_pred)[:, :take]
        ap = np.asarray(angles_pred)[:, :take]

        for b in range(take):
            m = mask[b]
            nv = int(m.sum())
            room = {
                "gt": {
                    "objs": objs[b, :nv].tolist(),
                    "angles": gt_angles[b, :nv].tolist(),
                    "boxes": gt_boxes[b, :nv].tolist(),
                    "triples": triples[b][tmask[b]].tolist(),
                }}
            for k in range(NSAMPLE):
                room[str(k)] = {"angles": ap[k, b, :nv].tolist(),
                                "boxes": bp[k, b, :nv].tolist()}
            data[int(room_ids[b])] = room

    out_path = os.path.join(test_data_dir, "data_extracted.json")
    with open(out_path, "w") as f:
        json.dump(data, f)
    return out_path
