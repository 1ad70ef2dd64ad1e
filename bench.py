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


def main():
    import jax
    import jax.numpy as jnp

    from sln_tpu.config import default_config, DataConfig
    from sln_tpu.models.vae import Sg2ScVAE
    from sln_tpu.workloads.heatmap import (heatmap_scene_batch,
                                           make_sampler)

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

    steps = 20
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


if __name__ == "__main__":
    main()
