"""On-device scene-graph construction: generated triples must satisfy the
host oracle and the reference's structural invariants
(data/suncg_dataset.py:168-289)."""

import numpy as np
import jax
import jax.numpy as jnp

from sln_tpu.data import synthetic, tensorize
from sln_tpu.data.augment import SizeInfo, build_graphs
from sln_tpu.data.vocab import PRED_IDX_TO_NAME, ROOM_IDX
from sln_tpu.ops.relations import P_IN_ROOM, P_ON, compute_rel_host_idx


def _setup(num_rooms=16, max_objects=16, seed=0):
    rooms = synthetic.generate_rooms(num_rooms, seed=seed)
    arrays = tensorize.tensorize_rooms(rooms, max_objects)
    table, median, avail = synthetic.default_size_table(128, seed=1)
    size_info = SizeInfo(jnp.asarray(table), jnp.asarray(median),
                         jnp.asarray(avail))
    return arrays, size_info


def test_build_graphs_invariants():
    arrays, size_info = _setup()
    key = jax.random.PRNGKey(0)
    batch = build_graphs(key, jnp.asarray(arrays["objs"]),
                         jnp.asarray(arrays["boxes"]),
                         jnp.asarray(arrays["angles"]),
                         jnp.asarray(arrays["obj_mask"]),
                         jnp.asarray(arrays["room_ids"]), size_info,
                         max_on_rels=16)
    objs = np.asarray(batch.objs)
    boxes = np.asarray(batch.boxes)
    mask = np.asarray(batch.obj_mask)
    triples = np.asarray(batch.triples)
    tmask = np.asarray(batch.triple_mask)
    attrs = np.asarray(batch.attrs)
    B, O = objs.shape
    K = 16  # max_on_rels

    for b in range(B):
        n = int(mask[b].sum())
        room = n - 1
        assert objs[b, room] == ROOM_IDX
        # denormalized boxes for the oracle
        dims = boxes[b, room, 3:]
        abs_boxes = boxes[b].copy()
        abs_boxes[:room] = abs_boxes[:room] * np.tile(dims, 2)

        # host on-pairs
        on_pairs = set()
        for i in range(room):
            for j in range(room):
                if i != j and compute_rel_host_idx(
                        abs_boxes[i], abs_boxes[j]) == P_ON:
                    on_pairs.add((i, j))

        got_on = set()
        for t in range(K):
            if tmask[b, t]:
                s, p, o = triples[b, t]
                assert p == P_ON
                got_on.add((int(s), int(o)))
        if len(on_pairs) <= K:
            assert got_on == on_pairs, (b, got_on, on_pairs)

        # random section: one per real object unless skipped
        for t in range(K, K + O):
            i = t - K
            if not tmask[b, t]:
                continue
            s, p, o = (int(x) for x in triples[b, t])
            assert i in (s, o)
            assert s < room and o < room and s != o
            assert (s, o) not in on_pairs and (o, s) not in on_pairs
            assert p == compute_rel_host_idx(abs_boxes[s], abs_boxes[o])

        # in_room section: exactly one edge per real object
        for t in range(K + O, K + 2 * O):
            i = t - K - O
            expect = i < room
            assert bool(tmask[b, t]) == expect
            if expect:
                s, p, o = (int(x) for x in triples[b, t])
                assert (s, p, o) == (i, P_IN_ROOM, room)

        # attributes: valid range, room/pad are 'none'
        assert np.all(attrs[b] >= 0) and np.all(attrs[b] < 5)
        assert attrs[b, room] == 0
        assert np.all(attrs[b, n:] == 0)


def test_attribute_distribution():
    arrays, size_info = _setup(num_rooms=64)
    key = jax.random.PRNGKey(3)
    batch = build_graphs(key, jnp.asarray(arrays["objs"]),
                         jnp.asarray(arrays["boxes"]),
                         jnp.asarray(arrays["angles"]),
                         jnp.asarray(arrays["obj_mask"]),
                         jnp.asarray(arrays["room_ids"]), size_info,
                         max_on_rels=16)
    attrs = np.asarray(batch.attrs)
    mask = np.asarray(batch.obj_mask) & ~np.asarray(batch.room_mask)
    vals = attrs[mask]
    # roughly half 'none' plus the in-band cases; non-none must appear
    assert (vals == 0).mean() > 0.4
    assert (vals > 0).mean() > 0.1
