"""Posterior statistics: encoder sweep -> (mean, full covariance) cache.

The reference iterates the train set collecting per-object posterior means
and accumulates a 64x64 covariance with an O(n*d^2) Python outer-product
loop (testing/test_VAE.py:33-57). Here the sweep is a jitted encoder over
padded batches and the covariance is one centered X^T X matmul on device.

Artifact parity: `mean_cov.pkl` holds [mean_est (d,), cov_est (d, d)]
exactly like the reference.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Tuple

import numpy as np

from sln_tpu.data.augment import SizeInfo, build_graphs


def collect_posterior_stats(model, variables, arrays: Dict[str, np.ndarray],
                            size_info: SizeInfo, cfg, batch_size: int = 256
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (mean (d,), cov (d, d)) over all valid objects' posterior mu."""
    import jax
    import jax.numpy as jnp

    from sln_tpu.models.vae import Sg2ScVAE

    @jax.jit
    def encode_batch(key, objs, boxes, angles, mask, room_ids):
        batch = build_graphs(key, objs, boxes, angles, mask, room_ids,
                             size_info, max_on_rels=cfg.data.max_on_rels,
                             use_attr_30=cfg.data.use_attr_30)
        mu, _ = model.apply(variables, batch, False,
                            method=Sg2ScVAE.encode)
        return mu, batch.obj_mask

    n = arrays["objs"].shape[0]
    # pad to a multiple of batch_size by wrapping (mask dedup via count)
    mus, masks = [], []
    key = jax.random.PRNGKey(123)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        if len(idx) < batch_size:
            idx = np.concatenate(
                [idx, np.zeros(batch_size - len(idx), np.int64)])
            pad = batch_size - (n - start)
        else:
            pad = 0
        mu, mask = encode_batch(
            jax.random.fold_in(key, start),
            arrays["objs"][idx], arrays["boxes"][idx],
            arrays["angles"][idx], arrays["obj_mask"][idx],
            arrays["room_ids"][idx])
        mu, mask = np.asarray(mu), np.array(mask)
        if pad:
            mask[-pad:] = False
        mus.append(mu[mask])
        masks.append(mask)
    X = np.concatenate(mus, axis=0).astype(np.float64)     # (n_obj, d)
    mean = X.mean(axis=0)
    Xc = X - mean
    cov = Xc.T @ Xc / max(len(X) - 1.0, 1.0)
    return mean.astype(np.float64), cov


def get_or_compute_mean_cov(model, variables, arrays, size_info, cfg,
                            test_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """Cache to `<test_dir>/mean_cov.pkl` (reference test_VAE.py:32-62)."""
    os.makedirs(test_dir, exist_ok=True)
    path = os.path.join(test_dir, "mean_cov.pkl")
    if os.path.isfile(path):
        with open(path, "rb") as f:
            mean, cov = pickle.load(f)
        return np.asarray(mean), np.asarray(cov)
    mean, cov = collect_posterior_stats(model, variables, arrays, size_info,
                                        cfg)
    with open(path, "wb") as f:
        pickle.dump([mean, cov], f)
    return mean, cov


def sample_z(key, mean: np.ndarray, cov: np.ndarray, shape) -> "jnp.ndarray":
    """z ~ N(mean, cov) with shape (*shape, d), via on-device Cholesky."""
    import jax
    import jax.numpy as jnp

    d = mean.shape[0]
    chol = jnp.asarray(np.linalg.cholesky(cov + 1e-10 * np.eye(d)),
                       jnp.float32)
    eps = jax.random.normal(key, tuple(shape) + (d,), jnp.float32)
    return jnp.asarray(mean, jnp.float32) + eps @ chol.T
