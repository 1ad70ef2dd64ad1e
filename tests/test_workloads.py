"""Eval workloads: posterior stats, batch_gen artifacts, heatmap artifacts,
acc/L1/std metrics, 2D plots."""

import json
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sln_tpu.config import DataConfig, default_config
from sln_tpu.data.augment import build_graphs
from sln_tpu.models.vae import Sg2ScVAE
from sln_tpu.workloads import (acc_l1_std, batch_gen, common, heatmap,
                               posterior)


@pytest.fixture(scope="module")
def setup():
    cfg = default_config()
    cfg = cfg.replace(data=DataConfig(max_objects=16, max_triples=48,
                                      max_on_rels=16))
    train_arrays, size_info = common.load_arrays(24, cfg)
    val_arrays, _ = common.load_arrays(12, cfg, synthetic_seed=5)
    b = 8
    example = build_graphs(
        jax.random.PRNGKey(0), jnp.asarray(train_arrays["objs"][:b]),
        jnp.asarray(train_arrays["boxes"][:b]),
        jnp.asarray(train_arrays["angles"][:b]),
        jnp.asarray(train_arrays["obj_mask"][:b]),
        jnp.asarray(train_arrays["room_ids"][:b]), size_info,
        max_on_rels=cfg.data.max_on_rels)
    model = Sg2ScVAE(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), example, None, False)
    return cfg, model, variables, train_arrays, val_arrays, size_info


def test_posterior_stats(setup, tmp_path):
    cfg, model, variables, tr, va, si = setup
    mean, cov = posterior.collect_posterior_stats(model, variables, tr, si,
                                                  cfg, batch_size=16)
    d = cfg.model.latent_dim
    assert mean.shape == (d,) and cov.shape == (d, d)
    assert np.all(np.isfinite(mean)) and np.all(np.isfinite(cov))
    # cov must be symmetric PSD
    np.testing.assert_allclose(cov, cov.T, atol=1e-9)
    evals = np.linalg.eigvalsh(cov)
    assert evals.min() > -1e-8

    # caching writes/reads the reference pkl format
    m2, c2 = posterior.get_or_compute_mean_cov(model, variables, tr, si,
                                               cfg, str(tmp_path))
    with open(tmp_path / "mean_cov.pkl", "rb") as f:
        loaded = pickle.load(f)
    assert len(loaded) == 2
    m3, c3 = posterior.get_or_compute_mean_cov(model, variables, tr, si,
                                               cfg, str(tmp_path))
    np.testing.assert_array_equal(m2, m3)


def test_batch_gen_artifact(setup, tmp_path):
    cfg, model, variables, tr, va, si = setup
    out = batch_gen.run_batch_gen(model, variables, tr, va, si, cfg,
                                  str(tmp_path), batch_size=8)
    with open(out) as f:
        data = json.load(f)
    assert len(data) == va["objs"].shape[0]
    room = next(iter(data.values()))
    assert set(room.keys()) == {"gt", "0", "1", "2", "3"}
    n = len(room["gt"]["objs"])
    assert len(room["gt"]["boxes"]) == n
    assert len(room["0"]["boxes"]) == n
    assert room["gt"]["objs"][-1] == 0  # room node last
    for tr_ in room["gt"]["triples"]:
        assert len(tr_) == 3


def test_heatmap_workload(setup, tmp_path):
    cfg, model, variables, tr, va, si = setup
    mean = np.zeros(cfg.model.latent_dim)
    cov = np.eye(cfg.model.latent_dim)
    pkl = heatmap.produce_heatmap(model, variables, mean, cov,
                                  str(tmp_path), num_iter=64, batch_size=32)
    with open(pkl, "rb") as f:
        objs, attrs, boxes_list, ag = pickle.load(f)
    assert len(boxes_list) == 64
    assert len(boxes_list[0]) == 6          # 5 objects + room
    assert boxes_list[0][0].shape == (6,)
    pngs = heatmap.plot_heatmap(pkl, str(tmp_path / "png"))
    assert len(pngs) == 5
    assert all(os.path.getsize(p) > 0 for p in pngs)


def test_acc_l1_std(setup):
    cfg, model, variables, tr, va, si = setup
    d = cfg.model.latent_dim
    mean, cov = np.zeros(d), np.eye(d)
    res = acc_l1_std.run_acc_l1(model, variables, va, si, cfg, mean, cov,
                                batch_size=8)
    for k in ("l1_pred", "l1_rand", "l1_pert", "acc_pred", "acc_rand",
              "acc_pert"):
        assert np.isfinite(res[k]), (k, res)
    assert 0.0 <= res["acc_pred"] <= 1.0
    # perturbed-GT should beat random boxes on L1 (sanity of the baselines)
    assert res["l1_pert"] < res["l1_rand"]
    std = acc_l1_std.run_std(model, variables, va, si, cfg, mean, cov,
                             nsample=4, batch_size=8)
    assert all(np.isfinite(v) for v in std.values())


def test_plot2d(tmp_path):
    from sln_tpu.workloads.plot2d import plot2d
    boxes = np.array([
        [0.3, 0.3, 0.0, 0.7, 0.8, 0.05],
        [0.1, 0.0, 0.3, 0.3, 0.7, 0.45],
        [0.0, 0.0, 0.0, 1.0, 0.73, 0.93]])
    out = tmp_path / "demo.png"
    plot2d(boxes, [0.0, 18.0, 0.0], [20, 30, 0], str(out))
    assert out.exists() and out.stat().st_size > 0


def test_sample_z_covariance():
    """posterior.sample_z must reproduce the requested full covariance
    (the reference draws from np.random.multivariate_normal with the full
    64x64 cov, test_VAE.py:82)."""
    import jax
    d = 6
    rng = np.random.default_rng(0)
    A = rng.standard_normal((d, d))
    cov = A @ A.T + 0.5 * np.eye(d)
    mean = rng.standard_normal(d)
    z = np.asarray(posterior.sample_z(jax.random.PRNGKey(0), mean, cov,
                                      (20000,)))
    emp_mean = z.mean(axis=0)
    emp_cov = np.cov(z.T)
    np.testing.assert_allclose(emp_mean, mean, atol=0.1)
    np.testing.assert_allclose(emp_cov, cov, atol=0.25, rtol=0.15)


def test_sharded_sampler_matches_single_device(setup):
    """Multi-chip serving path: the heatmap sampler sharded over the
    8-device data axis must produce the same layouts as the unsharded
    program (PRNG draws depend only on key and shape)."""
    from sln_tpu.parallel import mesh as meshlib
    from sln_tpu.workloads.heatmap import heatmap_scene_batch, make_sampler

    cfg, model, variables, tr, va, si = setup
    batch = heatmap_scene_batch(32, max_objects=16, max_triples=48)
    mean = np.zeros((cfg.model.latent_dim,), np.float32)
    cov = np.eye(cfg.model.latent_dim, dtype=np.float32)

    single = make_sampler(model, variables, batch, mean, cov)
    mesh = meshlib.make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    sharded = make_sampler(model, variables, batch, mean, cov, mesh=mesh)

    key = jax.random.PRNGKey(3)
    b1, a1 = single(key)
    b2, a2 = sharded(key)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # the sharded outputs actually live on the mesh
    assert len(b2.sharding.device_set) == 8


def test_synthetic_cache_corrupt_file_falls_back(tmp_path, monkeypatch,
                                                 capsys):
    """An unreadable/corrupt disk-cache entry regenerates instead of
    crashing every bench/test that calls load_arrays (the cache dir is
    world-shared /tmp: truncated npz from a killed writer, or a file
    owned by another user, must not be fatal)."""
    from sln_tpu.workloads.common import _synthetic_arrays_cached

    monkeypatch.setenv("SLN_TPU_DATA_CACHE", str(tmp_path))
    fresh = _synthetic_arrays_cached(4, 0, 16)
    cached = sorted(tmp_path.glob("syn_4_0_16_*.npz"))
    assert len(cached) == 1

    # truncate to garbage: np.load raises on this
    cached[0].write_bytes(b"not an npz")
    again = _synthetic_arrays_cached(4, 0, 16)
    assert "regenerating" in capsys.readouterr().out
    for k in fresh:
        np.testing.assert_array_equal(fresh[k], again[k])
    # the bad entry was replaced with a good one
    with np.load(cached[0]) as z:
        assert set(z.files) == set(fresh)
