"""Training loop: loss decreases, NaN guard works, and the SPMD step over an
8-device CPU mesh matches the single-device step."""

import numpy as np
import jax
import jax.numpy as jnp

from sln_tpu.config import default_config
from sln_tpu.data import synthetic, tensorize
from sln_tpu.data.augment import SizeInfo, build_graphs
from sln_tpu.parallel import mesh as meshlib
from sln_tpu.train import loop as train_loop


def _setup(batch_size=16, num_rooms=32):
    cfg = default_config()
    cfg = cfg.replace(train=cfg.train.__class__(batch_size=batch_size,
                                                learning_rate=1e-3))
    rooms = synthetic.generate_rooms(num_rooms, seed=0)
    arrays = tensorize.tensorize_rooms(rooms, cfg.data.max_objects)
    t, m, a = synthetic.default_size_table(128, seed=1)
    size_info = SizeInfo(jnp.asarray(t), jnp.asarray(m), jnp.asarray(a))
    example = build_graphs(jax.random.PRNGKey(0),
                           jnp.asarray(arrays["objs"][:batch_size]),
                           jnp.asarray(arrays["boxes"][:batch_size]),
                           jnp.asarray(arrays["angles"][:batch_size]),
                           jnp.asarray(arrays["obj_mask"][:batch_size]),
                           jnp.asarray(arrays["room_ids"][:batch_size]),
                           size_info)
    return cfg, arrays, size_info, example


def test_loss_decreases():
    cfg, arrays, size_info, example = _setup()
    model, state, tx = train_loop.create_state(cfg, jax.random.PRNGKey(0),
                                               example)
    step = train_loop.make_train_step(model, tx, cfg, size_info)
    rng = np.random.default_rng(0)
    first = last = None
    for epoch in range(6):
        for raw in train_loop.batches_from_arrays(arrays,
                                                  cfg.train.batch_size, rng):
            state, losses = step(state, raw, jax.random.PRNGKey(7))
            if first is None:
                first = float(losses["total_loss"])
            last = float(losses["total_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    assert int(state.step) > 0


def test_batch_indices_matches_batches_from_arrays():
    """The staged path's index stream and the host-gather iterator must
    consume one permutation per epoch and yield the identical batch
    sequence for the same rng (incl. the wrap-around padded final
    batch: 20 rooms / batch 8 -> 3 batches)."""
    cfg, arrays, _, _ = _setup(batch_size=8, num_rooms=20)
    idx_stream = list(train_loop.batch_indices(
        20, 8, np.random.default_rng(3)))
    raw_stream = list(train_loop.batches_from_arrays(
        arrays, 8, np.random.default_rng(3)))
    assert len(idx_stream) == len(raw_stream) == 3
    for idx, raw in zip(idx_stream, raw_stream):
        assert idx.shape == (8,) and idx.dtype == np.int32
        np.testing.assert_array_equal(arrays["objs"][idx], raw.objs)
        np.testing.assert_array_equal(arrays["boxes"][idx], raw.boxes)
        np.testing.assert_array_equal(arrays["room_ids"][idx],
                                      raw.room_ids)


def test_staged_step_matches_host_batches():
    """make_train_step(staged=True) — the stage-once device-gather path
    train.py defaults to on single-host runs — must reproduce the
    host-upload step exactly: same batches (shared permutation stream),
    same losses, same parameters after several steps."""
    cfg, arrays, size_info, example = _setup(batch_size=8, num_rooms=24)
    model, state, tx = train_loop.create_state(cfg, jax.random.PRNGKey(0),
                                               example)
    step = train_loop.make_train_step(model, tx, cfg, size_info)
    staged_step = train_loop.make_train_step(model, tx, cfg, size_info,
                                             staged=True)
    staged = train_loop.stage_arrays(arrays)

    s_host = jax.tree.map(jnp.copy, state)
    s_dev = jax.tree.map(jnp.copy, state)
    for raw, idx in zip(
            train_loop.batches_from_arrays(arrays, 8,
                                           np.random.default_rng(5)),
            train_loop.batch_indices(24, 8, np.random.default_rng(5))):
        s_host, l_host = step(s_host, raw, jax.random.PRNGKey(2))
        s_dev, l_dev = staged_step(s_dev, staged, jnp.asarray(idx),
                                   jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(l_host["total_loss"]),
                                   float(l_dev["total_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_host.params),
                    jax.tree.leaves(s_dev.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_staged_step_sharded_matches_unsharded():
    """The staged gather under a batch_sharding constraint on the 8-device
    CPU mesh equals the unconstrained single-device staged step."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg, arrays, size_info, example = _setup(batch_size=16, num_rooms=24)
    model, state, tx = train_loop.create_state(cfg, jax.random.PRNGKey(0),
                                               example)
    m = meshlib.make_mesh(num_data=8)
    plain = train_loop.make_train_step(model, tx, cfg, size_info,
                                       staged=True)
    sharded = train_loop.make_train_step(
        model, tx, cfg, size_info, staged=True,
        batch_sharding=meshlib.batch_sharding(m))
    staged_plain = train_loop.stage_arrays(arrays)
    staged_repl = train_loop.stage_arrays(arrays, meshlib.replicated(m))
    idx = next(train_loop.batch_indices(24, 16, np.random.default_rng(0)))

    s1, l1 = plain(jax.tree.map(jnp.copy, state), staged_plain,
                   jnp.asarray(idx), jax.random.PRNGKey(1))
    s8, l8 = sharded(meshlib.replicate(jax.tree.map(jnp.copy, state), m),
                     staged_repl, jnp.asarray(idx), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l1["total_loss"]),
                               float(l8["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_train_scan_matches_step_loop():
    """make_train_scan (whole loop in one device program — the device-
    throughput bench path) must reproduce n make_train_step calls with
    the same (raw, rng): identical final params and summed loss."""
    cfg, arrays, size_info, example = _setup(batch_size=8, num_rooms=8)
    model, state, tx = train_loop.create_state(cfg, jax.random.PRNGKey(0),
                                               example)
    step = train_loop.make_train_step(model, tx, cfg, size_info)
    scan = train_loop.make_train_scan(model, tx, cfg, size_info)
    raw = next(train_loop.batches_from_arrays(arrays, 8,
                                              np.random.default_rng(0)))
    rng = jax.random.PRNGKey(9)

    s_loop = jax.tree.map(jnp.copy, state)
    total = 0.0
    for _ in range(4):
        s_loop, losses = step(s_loop, raw, rng)
        total += float(losses["total_loss"])

    s_scan, scan_total = scan(jax.tree.map(jnp.copy, state), raw, rng, 4)
    np.testing.assert_allclose(total, float(scan_total), rtol=1e-5)
    assert int(s_scan.step) == int(s_loop.step) == 4
    for a, b in zip(jax.tree.leaves(s_loop.params),
                    jax.tree.leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_nan_guard_skips_update():
    cfg, arrays, size_info, example = _setup(batch_size=8, num_rooms=8)
    model, state, tx = train_loop.create_state(cfg, jax.random.PRNGKey(0),
                                               example)
    step = train_loop.make_train_step(model, tx, cfg, size_info)
    raw = next(train_loop.batches_from_arrays(arrays, 8,
                                              np.random.default_rng(0)))
    # poison the boxes -> L1 loss becomes NaN
    bad = raw._replace(boxes=raw.boxes * np.float32(np.nan))
    params_before = jax.tree.map(np.asarray, state.params)
    state2, losses = step(state, bad, jax.random.PRNGKey(0))
    assert losses["skipped_nan"] == 1.0
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_spmd_step_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg, arrays, size_info, example = _setup(batch_size=16, num_rooms=16)
    model, state, tx = train_loop.create_state(cfg, jax.random.PRNGKey(0),
                                               example)
    step = train_loop.make_train_step(model, tx, cfg, size_info)
    raw = next(train_loop.batches_from_arrays(arrays, 16,
                                              np.random.default_rng(0)))

    # single device
    s1, l1 = step(jax.tree.map(jnp.copy, state), raw, jax.random.PRNGKey(1))

    # 8-device data-parallel
    m = meshlib.make_mesh(num_data=8)
    raw_sharded = meshlib.shard_batch(raw, m)
    state_repl = meshlib.replicate(jax.tree.map(jnp.copy, state), m)
    s8, l8 = step(state_repl, raw_sharded, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(l1["total_loss"]),
                               float(l8["total_loss"]), rtol=1e-5)
    # Adam normalizes near-zero grads to ~±lr steps, so reduction-order fp
    # noise between the sharded and single-device grad sums can flip a step
    # direction: bound per-param divergence by ~2*lr (=2e-3 here) instead of
    # exact equality.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_multislice_step_matches_single_device():
    """The hybrid DCN x ICI mesh (2 slices x 2 data x 2 model on the 8
    virtual CPU devices): dp spans the slice boundary, tp stays inside a
    slice. Same step program as test_spmd_step_matches_single_device —
    XLA picks hierarchical collectives from the mesh; the numbers must
    not care."""
    from sln_tpu.parallel import sharding as shardlib

    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg, arrays, size_info, example = _setup(batch_size=16, num_rooms=16)
    model, state, tx = train_loop.create_state(cfg, jax.random.PRNGKey(0),
                                               example)
    step = train_loop.make_train_step(model, tx, cfg, size_info)
    raw = next(train_loop.batches_from_arrays(arrays, 16,
                                              np.random.default_rng(0)))

    s1, l1 = step(jax.tree.map(jnp.copy, state), raw, jax.random.PRNGKey(1))

    mesh = meshlib.make_multislice_mesh(num_slices=2, data_per_slice=2,
                                        num_model=2)
    assert mesh.axis_names == (meshlib.SLICE_AXIS, meshlib.DATA_AXIS,
                               meshlib.MODEL_AXIS)
    # batch shards jointly over (slice, data); params follow the TP rules
    raw_sharded = meshlib.shard_batch(raw, mesh)
    state_ms = train_loop.TrainState(
        params=shardlib.shard_params(
            jax.tree.map(jnp.copy, state.params), mesh),
        batch_stats=shardlib.shard_params(
            jax.tree.map(jnp.copy, state.batch_stats), mesh),
        opt_state=shardlib.shard_params(
            jax.tree.map(jnp.copy, state.opt_state), mesh),
        step=jax.device_put(state.step, meshlib.replicated(mesh)))
    s8, l8 = step(state_ms, raw_sharded, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(l1["total_loss"]),
                               float(l8["total_loss"]), rtol=1e-5)
    # same Adam near-zero-grad bound as the dp x tp equality test
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_multislice_mesh_refuses_simulation_across_real_slices():
    """When devices genuinely span multiple REAL slices (slice_index set),
    asking for more slices than the hardware spans must be an error, not
    a silent contiguous simulation: a contiguous fallback could put a DCN
    hop inside the latency-sensitive 'model' axis."""
    import pytest

    class FakeDev:
        def __init__(self, s):
            self.slice_index = s

    devs = [FakeDev(s) for s in (0, 0, 0, 0, 1, 1, 1, 1)]
    with pytest.raises(ValueError, match="span only"):
        meshlib.make_multislice_mesh(num_slices=4, data_per_slice=1,
                                     num_model=2, devices=devs)


def test_multislice_mesh_refuses_mixed_slice_indexed_devices():
    """A device list mixing slice-indexed and sliceless devices must be
    rejected (it would otherwise silently take the contiguous-simulation
    branch despite real slice boundaries being present)."""
    import pytest

    class FakeDev:
        def __init__(self, s):
            if s is not None:
                self.slice_index = s

    devs = [FakeDev(s) for s in (0, 0, 1, 1, None, None, None, None)]
    with pytest.raises(ValueError, match="mixes slice-indexed"):
        meshlib.make_multislice_mesh(num_slices=2, data_per_slice=1,
                                     num_model=2, devices=devs)


def test_microbatch_accumulation_matches_manual_loop():
    """cfg.train.microbatch runs the step as a scan of chunk fwd/bwd with
    one update. Replicate it by hand through the public pieces — per-chunk
    rng = fold_in(fold_in(rng, step), idx), BN stats threaded chunk to
    chunk, chunk grads weighted by valid-object counts (the vae_losses
    normalizer, so the loss normalization is exact across unequal chunks;
    train-mode BN still normalizes per chunk — standard accumulation
    semantics), one Adam update. Losses/stats must agree to fp noise;
    params to ~2*lr (Adam normalizes near-zero grads to +-lr steps, so
    jit-vs-eager reduction-order noise can flip a step — same bound as
    the SPMD equality test)."""
    import dataclasses as dc

    import optax

    from sln_tpu.train.losses import vae_losses

    cfg, arrays, size_info, example = _setup(batch_size=8, num_rooms=16)
    mb = 4
    cfg_mb = cfg.replace(train=dc.replace(cfg.train, microbatch=mb))
    raw = next(train_loop.batches_from_arrays(
        arrays, 8, np.random.default_rng(0)))
    raw = train_loop.RawBatch(*(jnp.asarray(x) for x in raw))
    model, state, tx = train_loop.create_state(
        cfg_mb, jax.random.PRNGKey(1), example)
    rng = jax.random.PRNGKey(3)

    step = train_loop.make_train_step(model, tx, cfg_mb, size_info)
    s_mb, l_mb = step(jax.tree.map(jnp.copy, state), raw, rng)

    # manual accumulation over the two chunks
    rng_step = jax.random.fold_in(rng, state.step)
    kl_w = train_loop.kl_weight_at(state.step + 1, cfg_mb.train)
    stats = state.batch_stats
    grads_sum, totals, counts = None, [], []
    for i in range(2):
        chunk = jax.tree.map(lambda a: a[i * mb:(i + 1) * mb], raw)
        rng_graph, rng_z = jax.random.split(
            jax.random.fold_in(rng_step, jnp.int32(i)))
        batch = build_graphs(rng_graph, chunk.objs, chunk.boxes,
                             chunk.angles, chunk.obj_mask, chunk.room_ids,
                             size_info, max_on_rels=cfg.data.max_on_rels)
        n = jnp.maximum(batch.obj_mask.astype(jnp.float32).sum(), 1.0)

        def loss_fn(params, batch=batch, rng_z=rng_z, stats=stats):
            (mu, logvar, bp, alp), mut = model.apply(
                {"params": params, "batch_stats": stats}, batch, rng_z,
                True, mutable=["batch_stats"])
            total, _ = vae_losses(batch, mu, logvar, bp, alp, kl_w,
                                  cfg.model.use_ae, cfg.train.kl_free_bits)
            return total, mut["batch_stats"]

        (total, stats), g = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        totals.append(total)
        counts.append(n)
        g = jax.tree.map(lambda x: n * x, g)
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    n_total = counts[0] + counts[1]
    assert float(counts[0]) != float(counts[1]), \
        "fixture too uniform to exercise the valid-count weighting"
    grads = jax.tree.map(lambda g: g / n_total, grads_sum)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    expect_params = optax.apply_updates(state.params, updates)

    np.testing.assert_allclose(
        np.asarray(l_mb["total_loss"]),
        np.asarray((counts[0] * totals[0] + counts[1] * totals[1])
                   / n_total), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=0, atol=2.5e-3),
        s_mb.params, expect_params)
    # BN var is one-pass E[x^2]-E[x]^2 (layers.py): the subtraction
    # amplifies jit-vs-eager fp noise by ~1/var, so the stats check only
    # guards gross threading errors (e.g. chunk 1 seeing init stats)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-5),
        s_mb.batch_stats, stats)


def test_microbatch_indivisible_batch_raises():
    import dataclasses as dc

    import pytest

    cfg, arrays, size_info, example = _setup(batch_size=8, num_rooms=8)
    cfg = cfg.replace(train=dc.replace(cfg.train, microbatch=3))
    raw = next(train_loop.batches_from_arrays(
        arrays, 8, np.random.default_rng(0)))
    model, state, tx = train_loop.create_state(
        cfg, jax.random.PRNGKey(1), example)
    step = train_loop.make_train_step(model, tx, cfg, size_info)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, raw, jax.random.PRNGKey(0))


def test_microbatch_at_batch_size_is_the_fast_path():
    """microbatch >= batch must route to the unchunked fast path:
    bit-identical to microbatch=0 (same program, same rng stream)."""
    import dataclasses as dc

    cfg, arrays, size_info, example = _setup(batch_size=8, num_rooms=8)
    raw = next(train_loop.batches_from_arrays(
        arrays, 8, np.random.default_rng(0)))
    rng = jax.random.PRNGKey(5)
    results = []
    for mb in (0, 8):
        cfg_i = cfg.replace(train=dc.replace(cfg.train, microbatch=mb))
        model, state, tx = train_loop.create_state(
            cfg_i, jax.random.PRNGKey(1), example)
        step = train_loop.make_train_step(model, tx, cfg_i, size_info)
        results.append(step(state, raw, rng))
    (s0, l0), (s1, l1) = results
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s0.params, s1.params)
    for key in l0:
        np.testing.assert_array_equal(np.asarray(l0[key]),
                                      np.asarray(l1[key]))


def test_train_step_deterministic():
    """Determinism stands in for the reference's global manual_seed
    (SURVEY 5.2): identical state + batch + key -> bit-identical update."""
    cfg, arrays, size_info, example = _setup(batch_size=8, num_rooms=16)
    raw = next(train_loop.batches_from_arrays(
        arrays, 8, np.random.default_rng(0)))
    model, state, tx = train_loop.create_state(
        cfg, jax.random.PRNGKey(1), example)
    step = train_loop.make_train_step(model, tx, cfg, size_info)
    rng = jax.random.PRNGKey(2)
    s1, l1 = step(state, raw, rng)
    model2, state2, tx2 = train_loop.create_state(
        cfg, jax.random.PRNGKey(1), example)
    step2 = train_loop.make_train_step(model2, tx2, cfg, size_info)
    s2, l2 = step2(state2, raw, rng)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s1.params, s2.params)
    for k in l1:
        np.testing.assert_array_equal(np.asarray(l1[k]), np.asarray(l2[k]))


def test_host_sharded_batches_form_exact_global_stream():
    """Two simulated hosts' disjoint shards concatenate (in process order)
    to the exact single-process batches_from_arrays stream — the multi-
    host input-pipeline invariant (SURVEY §2.10)."""
    _, arrays, _, _ = _setup()
    B = 8
    ref = list(train_loop.batches_from_arrays(
        arrays, B, np.random.default_rng(7)))
    shards = [list(train_loop.host_sharded_batches(
                  arrays, B, np.random.default_rng(7),
                  process_index=i, process_count=2))
              for i in range(2)]
    assert len(shards[0]) == len(ref) and len(shards[1]) == len(ref)
    for r, a, b in zip(ref, *shards):
        for field in train_loop.RawBatch._fields:
            got = np.concatenate([np.asarray(getattr(a, field)),
                                  np.asarray(getattr(b, field))])
            np.testing.assert_array_equal(got, np.asarray(getattr(r,
                                                                  field)))

    # indivisible global batch raises rather than silently dropping rows
    import pytest
    with pytest.raises(ValueError):
        next(train_loop.host_sharded_batches(
            arrays, 9, np.random.default_rng(0),
            process_index=0, process_count=2))


def test_global_from_host_shards_matches_shard_batch():
    """Single-process global_from_host_shards (the multi-host input
    boundary, make_array_from_process_local_data) builds the same sharded
    global batch as a plain sharded device_put."""
    _, arrays, _, _ = _setup()
    B = 8
    raw = next(train_loop.batches_from_arrays(
        arrays, B, np.random.default_rng(3)))
    local = next(train_loop.host_sharded_batches(
        arrays, B, np.random.default_rng(3),
        process_index=0, process_count=1))
    mesh = meshlib.make_mesh(num_data=4)
    via_put = meshlib.shard_batch(
        train_loop.RawBatch(*(jnp.asarray(x) for x in raw)), mesh)
    via_global = meshlib.global_from_host_shards(local, mesh, B)
    for field in train_loop.RawBatch._fields:
        a, b = getattr(via_global, field), getattr(via_put, field)
        assert a.sharding == b.sharding, field
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
