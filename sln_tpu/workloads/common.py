"""Shared workload setup: config, data, model restore."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from sln_tpu.config import Config
from sln_tpu.data import synthetic, tensorize
from sln_tpu.data.augment import SizeInfo
from sln_tpu.train import checkpoint as ckpt_lib


def load_arrays(path_or_synthetic, cfg: Config, synthetic_seed=0):
    """path (reference JSON schema) or int N -> padded arrays + size table."""
    import jax.numpy as jnp
    if isinstance(path_or_synthetic, int):
        rooms = synthetic.generate_rooms(path_or_synthetic,
                                         seed=synthetic_seed)
        arrays = tensorize.tensorize_rooms(rooms, cfg.data.max_objects)
    else:
        arrays = tensorize.tensorize_file(path_or_synthetic,
                                          cfg.data.max_objects)
    t, m, a = synthetic.default_size_table()
    size_info = SizeInfo(jnp.asarray(t), jnp.asarray(m), jnp.asarray(a))
    return arrays, size_info


def restore_model(cfg: Config, example_batch, allow_random: bool = False):
    """Build Sg2ScVAE and load weights from the latest checkpoint.

    Mirrors the reference's restore pattern (testing/test_VAE.py:21-26).
    With allow_random=True, missing checkpoints fall back to random init
    (useful for smoke tests / benchmarks of untrained throughput).
    """
    import jax

    from sln_tpu.models.vae import Sg2ScVAE

    model = Sg2ScVAE(cfg.model)
    path = ckpt_lib.latest_path(cfg.train.output_dir,
                                cfg.train.checkpoint_name)
    ckpt = ckpt_lib.load_checkpoint(path)
    if ckpt is None:
        # reference-trained torch checkpoint drop-in (train.py:99 format)
        pt_path = ckpt_lib.reference_pt_path(cfg.train.output_dir,
                                             cfg.train.checkpoint_name)
        ckpt = ckpt_lib.load_reference_checkpoint(pt_path, cfg.model)
        if ckpt is not None:
            path = pt_path
    if ckpt is not None:
        ms = ckpt["model_state"]
        variables = {"params": ms["params"],
                     "batch_stats": ms["batch_stats"]}
        print(f"Restored checkpoint from {path}")
    elif allow_random:
        print(f"WARNING: no checkpoint at {path}; using random weights")
        variables = model.init(jax.random.PRNGKey(0), example_batch, None,
                               False)
    else:
        raise FileNotFoundError(
            f"checkpoint not found: {path} (train first, or pass "
            f"--allow_random_weights)")
    return model, variables
