"""Relation oracle: vectorized JAX vs the scalar host implementation, and
the host implementation vs the reference's compute_rel (utils.py:36-80)."""

import numpy as np
import pytest

from sln_tpu.data.vocab import PRED_IDX_TO_NAME
from sln_tpu.ops.relations import (compute_rel_host, compute_rel_host_idx,
                                   relation_matrix)


def random_boxes(rng, n):
    lo = rng.uniform(0, 4, size=(n, 3))
    size = rng.uniform(0.05, 2.0, size=(n, 3))
    return np.concatenate([lo, lo + size], axis=1).astype(np.float32)


def test_host_matches_reference_oracle():
    import sys
    sys.path.insert(0, "/root/reference")
    from utils import compute_rel as ref_compute_rel

    rng = np.random.default_rng(0)
    boxes = random_boxes(rng, 40)
    for i in range(len(boxes)):
        for j in range(len(boxes)):
            if i == j:
                continue
            ours = compute_rel_host(boxes[i], boxes[j], None, None)
            theirs = ref_compute_rel(boxes[i], boxes[j], None, None)
            assert ours == theirs, (i, j, ours, theirs)
    # room override
    assert compute_rel_host(boxes[0], boxes[1], None, "__room__") == \
        "__in_room__"


def test_relation_matrix_matches_host():
    rng = np.random.default_rng(1)
    boxes = random_boxes(rng, 24)
    mat = np.asarray(relation_matrix(boxes))
    for i in range(len(boxes)):
        for j in range(len(boxes)):
            if i == j:
                continue
            expected = compute_rel_host_idx(boxes[i], boxes[j])
            assert mat[i, j] == expected, (
                i, j, PRED_IDX_TO_NAME[mat[i, j]], PRED_IDX_TO_NAME[expected])


def test_relation_matrix_on_stacked_boxes():
    # A box resting exactly on another must be 'on'.
    base = np.array([[0, 0, 0, 2, 1, 2]], np.float32)
    top = np.array([[0.5, 1.0, 0.5, 1.5, 1.5, 1.5]], np.float32)
    boxes = np.concatenate([top, base], axis=0)
    mat = np.asarray(relation_matrix(boxes))
    assert PRED_IDX_TO_NAME[mat[0, 1]] == "on"


def test_relation_matrix_no_nan_on_degenerate():
    boxes = np.zeros((4, 6), np.float32)
    mat = np.asarray(relation_matrix(boxes))
    assert mat.dtype == np.int32
    assert np.all((0 <= mat) & (mat < len(PRED_IDX_TO_NAME)))
