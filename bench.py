#!/usr/bin/env python
"""Headline benchmark: sampled layouts/sec/chip.

Reproduces the reference's heatmap workload (testing/test_heatmap.py:10-64:
20,000 sequential decoder calls on one 6-node scene graph) as a single
batched jitted program: z ~ N(mean, cov) via on-device Cholesky sampling,
then the Sg2ScVAE decoder over thousands of scenes per step.

Prints ONE JSON line {metric, value, unit, vs_baseline}. vs_baseline is
relative to the driver-set north-star target of 5,000 layouts/sec/chip
(BASELINE.md — the reference publishes no numbers).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_LAYOUTS_PER_SEC = 5000.0


def bench_refine(num_rooms: int = 1) -> dict:
    """Refinement render-grad steps/sec (north star: >= 200/s).

    num_rooms > 1 refines independent rooms simultaneously in one device
    program (the serving configuration); the reported rate is aggregate
    room-steps/sec."""
    import dataclasses
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sln_tpu.config import DataConfig, default_config
    from sln_tpu.data.augment import build_graphs
    from sln_tpu.models.vae import Sg2ScVAE
    from sln_tpu.render import assets, scene as scene_lib
    from sln_tpu.workloads import common, refine

    B = num_rooms
    cfg = default_config().replace(
        data=DataConfig(max_objects=16, max_triples=48, max_on_rels=16))
    val_arrays, size_info = common.load_arrays(max(B, 8), cfg,
                                               synthetic_seed=3)
    batch = build_graphs(
        jax.random.PRNGKey(0), jnp.asarray(val_arrays["objs"][:B]),
        jnp.asarray(val_arrays["boxes"][:B]),
        jnp.asarray(val_arrays["angles"][:B]),
        jnp.asarray(val_arrays["obj_mask"][:B]),
        jnp.asarray(val_arrays["room_ids"][:B]), size_info, max_on_rels=16)
    model = Sg2ScVAE(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    bank_host = assets.build_procedural_bank(cfg.render.mesh_subdiv)
    bank = scene_lib.device_bank(bank_host, cfg.render.shell_subdiv)
    import dataclasses as dc
    rcfg = dc.replace(cfg.render, camera=dc.replace(
        cfg.render.camera, image_size=cfg.refine.render_size))
    room_row = (batch.boxes * batch.room_mask[..., None]).sum(
        1, keepdims=True)                                # (B, 1, 6)
    dims = np.asarray(room_row)[:, 0, 3:]
    abs0 = np.asarray(batch.boxes) * np.concatenate(
        [dims, dims], -1)[:, None, :]
    midx = jnp.stack([
        assets.retrieve_models(batch.objs[b], jnp.asarray(abs0[b]),
                               bank_host) for b in range(B)])
    target = jax.vmap(
        lambda o, bx, a, m, mi: scene_lib.render_layout(
            o, bx, a, m, mi, bank, rcfg))(
        batch.objs, batch.boxes, batch.angles.astype(jnp.float32),
        batch.obj_mask, midx)
    size_t = jnp.asarray(abs0[:, :, 3:] - abs0[:, :, :3])
    tx, step, snap, run_scan = refine.make_refine_step(
        model, variables.get("batch_stats", {}), batch, midx, bank, target,
        size_t, room_row, cfg)
    z0 = jnp.zeros((B, batch.max_objects, cfg.model.latent_dim))
    opt = tx.init((z0, variables["params"]))
    state = refine.RefineState(z0, variables["params"], opt,
                               jnp.zeros((), jnp.int32))
    N = 240
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    s2, _ = run_scan(state, keys)
    jax.block_until_ready(s2.z)
    t0 = _time.perf_counter()
    s2, _ = run_scan(state, keys)
    jax.block_until_ready(s2.z)
    rate = N * B / (_time.perf_counter() - t0)
    suffix = "" if B == 1 else f"_batched_{B}_rooms"
    return {"metric": f"refine_render_grad_steps_per_sec{suffix}",
            "value": round(rate, 1), "unit": "room-steps/s",
            "vs_baseline": round(rate / 200.0, 3)}


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from sln_tpu.config import default_config, DataConfig
    from sln_tpu.models.vae import Sg2ScVAE
    from sln_tpu.workloads.heatmap import (heatmap_scene_batch,
                                           make_sampler)

    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also benchmark refinement steps/sec")
    opts = ap.parse_args()

    cfg = default_config()
    cfg = cfg.replace(data=DataConfig(max_objects=8, max_triples=24,
                                      max_on_rels=8))

    # the reference's default 5-object scene graph (test_heatmap.py:41-43)
    batch_size = 4096
    batch = heatmap_scene_batch(batch_size, max_objects=8, max_triples=24)

    model = Sg2ScVAE(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)

    latent = cfg.model.latent_dim
    mean = np.zeros((latent,), np.float32)
    cov = np.eye(latent, dtype=np.float32)
    sample_fn = make_sampler(model, variables, batch, mean, cov)

    # warmup / compile
    key = jax.random.PRNGKey(42)
    boxes, angles = sample_fn(key)
    jax.block_until_ready(boxes)

    steps = 40
    t0 = time.perf_counter()
    for i in range(steps):
        boxes, angles = sample_fn(jax.random.fold_in(key, i))
    jax.block_until_ready(boxes)
    dt = time.perf_counter() - t0

    layouts_per_sec = steps * batch_size / dt
    print(json.dumps({
        "metric": "sampled_layouts_per_sec_per_chip",
        "value": round(layouts_per_sec, 1),
        "unit": "layouts/s",
        "vs_baseline": round(layouts_per_sec / TARGET_LAYOUTS_PER_SEC, 3),
    }))
    if opts.full:
        print(json.dumps(bench_refine()))
        print(json.dumps(bench_refine(num_rooms=8)))


if __name__ == "__main__":
    main()
