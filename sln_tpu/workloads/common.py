"""Shared workload setup: config, data, model restore."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from sln_tpu.config import Config
from sln_tpu.data import synthetic, tensorize
from sln_tpu.data.augment import SizeInfo
from sln_tpu.train import checkpoint as ckpt_lib


def _generator_code_token() -> str:
    """Short hash of the data-generating sources (synthetic.py,
    tensorize.py, and vocab.py — the transitive dep that defines the
    object indices tensorize emits), so the disk cache self-invalidates
    when any of them changes — a (n, seed) key alone would silently serve
    arrays produced by old code to every test and bench."""
    import hashlib

    from sln_tpu.data import vocab

    h = hashlib.sha1()
    for mod in (synthetic, tensorize, vocab):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:8]


def _synthetic_arrays_cached(n: int, seed: int, max_objects: int):
    """Tensorized synthetic rooms, disk-cached.

    Generating rooms is pure host Python (~minutes for 4096 rooms on one
    core) and bench/tools regenerate identical sets repeatedly; the
    deterministic (n, seed, max_objects, code-hash) key makes an .npz
    cache exact. Set SLN_TPU_DATA_CACHE=0 to disable, or point it at a
    directory.
    """
    import os
    import tempfile

    cache_root = os.environ.get("SLN_TPU_DATA_CACHE", "")
    if cache_root == "0":
        rooms = synthetic.generate_rooms(n, seed=seed)
        return tensorize.tensorize_rooms(rooms, max_objects)
    cache_dir = cache_root or os.path.join(tempfile.gettempdir(),
                                           "sln_tpu_data_cache")
    path = os.path.join(
        cache_dir,
        f"syn_{n}_{seed}_{max_objects}_{_generator_code_token()}.npz")
    if os.path.isfile(path):
        # a cache entry we can't read (foreign-owner perms in the shared
        # /tmp dir, or a truncated npz from a killed writer) must fall
        # back to regeneration, not crash every bench/test
        try:
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        except Exception as e:
            print(f"| data cache unreadable ({path}: {e}); regenerating",
                  flush=True)
            try:
                os.unlink(path)
            except OSError:
                pass
    rooms = synthetic.generate_rooms(n, seed=seed)
    arrays = tensorize.tensorize_rooms(rooms, max_objects)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:     # file object: np.savez would
            np.savez(f, **arrays)      # append .npz to a str path
        os.replace(tmp, path)          # atomic vs concurrent writers
    except OSError:
        pass
    return arrays


def load_arrays(path_or_synthetic, cfg: Config, synthetic_seed=0):
    """path (reference JSON schema) or int N -> padded arrays + size table."""
    import jax.numpy as jnp
    if isinstance(path_or_synthetic, int):
        arrays = _synthetic_arrays_cached(path_or_synthetic, synthetic_seed,
                                          cfg.data.max_objects)
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
