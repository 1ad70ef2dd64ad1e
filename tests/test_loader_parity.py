"""Cross-validate the data loader against the reference dataset class.

Feeds one fabricated `data_rot_*.json` (the schema data/synthetic.py emits)
through the reference's SuncgDataset (/root/reference/data/suncg_dataset.py,
imported READ-ONLY as an oracle) and through this repo's tensorizer, and
asserts identical vocab indices, normalized boxes, and angles — plus that
every stochastic triple the reference sampled carries the predicate this
repo's vectorized relation oracle assigns to the same pair.

The reference loads metadata/{valid_types,size_info_many,
30_size_info_many}.json by cwd-relative path (suncg_dataset.py:30,84-87)
and ships no metadata/; the fixture fabricates them from this repo's vocab
and synthetic size table, which also makes the reference's attribute
thresholds checkable against our normalized box values.
"""

import json
import os
import sys

import numpy as np
import pytest

from sln_tpu.data.synthetic import (default_size_table, generate_rooms,
                                    reference_metadata)
from sln_tpu.data.tensorize import tensorize_file, tensorize_rooms
from sln_tpu.data.vocab import (ATTR_IDX_TO_NAME, OBJECT_IDX_TO_NAME,
                                PRED_IDX_TO_NAME, ROOM_IDX)

REFERENCE = "/root/reference"
MAX_OBJECTS = 24


@pytest.fixture(scope="module")
def ref_dataset_cls():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    inserted = REFERENCE not in sys.path
    if inserted:
        sys.path.insert(0, REFERENCE)
    from data.suncg_dataset import SuncgDataset
    yield SuncgDataset
    # the reference repo has top-level train.py/test.py: leaving it on
    # sys.path would shadow this repo's CLIs for later-imported tests
    if inserted and REFERENCE in sys.path:
        sys.path.remove(REFERENCE)


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    stage = tmp_path_factory.mktemp("loader_parity")
    rooms = generate_rooms(8, seed=123)
    data_path = stage / "data_rot_val.json"
    data_path.write_text(json.dumps(rooms))

    meta = stage / "metadata"
    meta.mkdir()
    # one staging recipe shared with tools/run_reference_baseline.py
    table, median, avail = default_size_table()
    valid_types, size_many, size_30 = reference_metadata(table, median,
                                                         avail)
    (meta / "valid_types.json").write_text(json.dumps(valid_types))
    (meta / "size_info_many.json").write_text(json.dumps(size_many))
    (meta / "30_size_info_many.json").write_text(json.dumps(size_30))
    return stage, rooms, table, avail


def _load_ref_items(ref_dataset_cls, staged, monkeypatch, use_attr_30):
    stage, rooms, _, _ = staged
    monkeypatch.chdir(stage)
    import random
    random.seed(99)
    dset = ref_dataset_cls(str(stage / "data_rot_val.json"), train_3d=True,
                           use_attr_30=use_attr_30)
    return dset, [dset[i] for i in range(len(dset))]


def test_vocab_parity(ref_dataset_cls, staged, monkeypatch):
    dset, _ = _load_ref_items(ref_dataset_cls, staged, monkeypatch, True)
    assert dset.vocab["object_idx_to_name"] == list(OBJECT_IDX_TO_NAME)
    assert dset.vocab["pred_idx_to_name"] == list(PRED_IDX_TO_NAME)
    assert dset.vocab["attrib_idx_to_name"] == list(ATTR_IDX_TO_NAME)


def test_boxes_angles_objs_parity(ref_dataset_cls, staged, monkeypatch):
    stage, rooms, _, _ = staged
    dset, items = _load_ref_items(ref_dataset_cls, staged, monkeypatch,
                                  True)
    arrays = tensorize_rooms(rooms, MAX_OBJECTS)
    # reference iterates rooms in json insertion order; ours sorts by
    # int(room_id) — synthetic keys are "0".."7" so both agree, but map
    # by room id to stay robust
    by_id = {int(r): k for k, r in enumerate(arrays["room_ids"])}
    for room_id, objs, boxes, triples, angles, attributes in items:
        r = by_id[int(room_id)]
        n = int(arrays["obj_mask"][r].sum())       # includes __room__
        assert n == objs.shape[0]
        np.testing.assert_array_equal(arrays["objs"][r, :n],
                                      objs.numpy())
        assert arrays["objs"][r, n - 1] == ROOM_IDX
        np.testing.assert_allclose(arrays["boxes"][r, :n], boxes.numpy(),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(arrays["angles"][r, :n],
                                      angles.numpy())


def test_cpp_packer_matches_python(staged):
    stage, rooms, _, _ = staged
    py = tensorize_rooms(rooms, MAX_OBJECTS)
    packed = tensorize_file(str(stage / "data_rot_val.json"), MAX_OBJECTS)
    for key in py:
        np.testing.assert_allclose(packed[key], py[key], rtol=1e-6,
                                   atol=1e-6, err_msg=key)


def test_ref_triples_match_relation_oracle(ref_dataset_cls, staged,
                                           monkeypatch):
    """Every triple the reference samples (on / random / __in_room__,
    suncg_dataset.py:178-212) must carry the predicate this repo's
    vectorized oracle assigns to the same absolute-box pair."""
    import jax

    from sln_tpu.ops.relations import P_IN_ROOM, relation_matrix

    jax.config.update("jax_platforms", "cpu")
    _, items = _load_ref_items(ref_dataset_cls, staged, monkeypatch, True)
    checked = 0
    for room_id, objs, boxes, triples, angles, attributes in items:
        n = objs.shape[0]
        # reference builds triples BEFORE normalization on absolute boxes
        # (normalization happens after, :216-231); undo it for the oracle
        abs_boxes = boxes.numpy().copy()
        room = abs_boxes[-1]
        scale = np.array([room[3], room[4], room[5],
                          room[3], room[4], room[5]])
        abs_boxes[:-1] *= scale
        relmat = np.asarray(relation_matrix(abs_boxes))
        for s, p, o in triples.numpy():
            if o == n - 1:                       # room object
                assert p == P_IN_ROOM
            else:
                assert relmat[s, o] == p, (room_id, s, o, p, relmat[s, o])
                checked += 1
    assert checked > 20


def test_ref_attributes_respect_thresholds(ref_dataset_cls, staged,
                                           monkeypatch):
    """When the reference assigns tall/short/large/small (use_attr_30,
    suncg_dataset.py:257-285) via the staged size table, the threshold
    condition must hold for our normalized box values."""
    stage, rooms, table, avail = staged
    _, items = _load_ref_items(ref_dataset_cls, staged, monkeypatch, True)
    arrays = tensorize_rooms(rooms, MAX_OBJECTS)
    by_id = {int(r): k for k, r in enumerate(arrays["room_ids"])}
    seen = set()
    for room_id, objs, boxes, triples, angles, attributes in items:
        r = by_id[int(room_id)]
        n = objs.shape[0]
        b = arrays["boxes"][r, :n]
        nh = b[:, 4] - b[:, 1]
        nv = (b[:, 3] - b[:, 0]) * nh * (b[:, 5] - b[:, 2])
        for i, a in enumerate(attributes.numpy()[:-1]):
            cls = int(objs[i])
            h3, h7, v3, v7 = table[cls]
            if a == 1:
                assert avail[cls] and nh[i] > h7
            elif a == 2:
                assert avail[cls] and nh[i] < h3
            elif a == 3:
                assert avail[cls] and nv[i] > v7
            elif a == 4:
                assert avail[cls] and nv[i] < v3
            seen.add(int(a))
    assert seen >= {0, 1}      # the draw produced real attributes too
