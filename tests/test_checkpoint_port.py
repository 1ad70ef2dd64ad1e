"""Round-trip import of a reference-format torch checkpoint
(`latest_checkpoint_with_model.pt`, reference train.py:34-55, :93-100):
build the reference torch Sg2ScVAEModel, save its checkpoint dict with
torch.save, restore through common.restore_model, and verify (a) decoder
parity vs the torch oracle and (b) the eval workloads run end-to-end on
the imported weights (VERDICT r1 item 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sln_tpu.config import DataConfig, TrainConfig, default_config
from sln_tpu.data.augment import build_graphs
from sln_tpu.data.vocab import VOCAB
from sln_tpu.models.vae import Sg2ScVAE
from sln_tpu.workloads import acc_l1_std, common, posterior


@pytest.fixture(scope="module")
def ported(reference_modules, tmp_path_factory):
    """Save a reference-format .pt, restore it via common.restore_model."""
    import torch

    tmp = tmp_path_factory.mktemp("refckpt")
    cfg = default_config()
    cfg = cfg.replace(
        data=DataConfig(max_objects=16, max_triples=48, max_on_rels=16),
        train=TrainConfig(output_dir=str(tmp)))

    torch.manual_seed(7)
    ref = reference_modules["vae"].Sg2ScVAEModel(
        vocab=VOCAB.to_dict(), embedding_dim=cfg.model.embedding_dim,
        decoder_cat=cfg.model.decoder_cat,
        gconv_num_layers=cfg.model.gconv_num_layers,
        mlp_normalization=cfg.model.mlp_normalization,
        use_attr=cfg.model.use_attr)
    ref.eval()

    # exact reference on-disk schema (train.py:34-55, :93-100)
    ckpt = {
        "args": {"embedding_dim": cfg.model.embedding_dim},
        "vocab": VOCAB.to_dict(),
        "model_kwargs": {},
        "losses_ts": [100],
        "losses": {"total_loss": [1.0]},
        "checkpoint_ts": [],
        "counters": {"t": 100, "epoch": 1},
        "model_state": ref.state_dict(),
        "optim_state": {"param_groups": []},
    }
    torch.save(ckpt, tmp / "latest_latest_checkpoint_with_model.pt")

    model, variables = common.restore_model(cfg, example_batch=None)
    return cfg, ref, model, variables


def test_ported_decoder_matches_torch(ported):
    import torch

    cfg, ref, model, variables = ported
    rng = np.random.default_rng(3)
    n = 6
    objs = rng.integers(1, 31, n).astype(np.int64)
    attrs = rng.integers(0, 5, n).astype(np.int64)
    triples = np.stack([
        rng.integers(0, n, 4), rng.integers(0, 16, 4),
        rng.integers(0, n, 4)], axis=1).astype(np.int64)
    z = rng.standard_normal((n, cfg.model.latent_dim)).astype(np.float32)

    with torch.no_grad():
        ref_boxes, ref_angles = ref.decoder(
            torch.from_numpy(z), torch.from_numpy(objs),
            torch.from_numpy(triples), torch.from_numpy(attrs))

    from sln_tpu.data.batch import make_scene_batch
    O, T = 8, 12
    objs_p = np.zeros((1, O), np.int32)
    objs_p[0, :n] = objs
    attrs_p = np.zeros((1, O), np.int32)
    attrs_p[0, :n] = attrs
    mask = np.zeros((1, O), bool)
    mask[0, :n] = True
    trip_p = np.zeros((1, T, 3), np.int32)
    trip_p[0, :len(triples)] = triples
    tmask = np.zeros((1, T), bool)
    tmask[0, :len(triples)] = True
    batch = make_scene_batch(objs_p, np.zeros((1, O, 6), np.float32),
                             np.zeros((1, O), np.int32), attrs_p, mask,
                             trip_p, tmask)
    z_p = np.zeros((1, O, cfg.model.latent_dim), np.float32)
    z_p[0, :n] = z
    boxes_pred, angle_lp = model.apply(variables, jnp.asarray(z_p), batch,
                                       False, method=Sg2ScVAE.decode)
    np.testing.assert_allclose(np.asarray(boxes_pred)[0, :n],
                               ref_boxes.numpy(), rtol=5e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(angle_lp)[0, :n],
                               ref_angles.numpy(), rtol=5e-4, atol=5e-4)


def test_ported_checkpoint_runs_eval_workloads(ported):
    cfg, ref, model, variables = ported
    train_arrays, size_info = common.load_arrays(16, cfg)
    val_arrays, _ = common.load_arrays(8, cfg, synthetic_seed=5)
    mean, cov = posterior.collect_posterior_stats(
        model, variables, train_arrays, size_info, cfg, batch_size=8)
    assert np.all(np.isfinite(mean)) and np.all(np.isfinite(cov))
    res = acc_l1_std.run_acc_l1(model, variables, val_arrays, size_info,
                                cfg, mean, cov, batch_size=8)
    for k in ("acc_pred", "acc_rand", "acc_pert", "l1_pred"):
        assert np.isfinite(res[k]), (k, res)
    std = acc_l1_std.run_std(model, variables, val_arrays, size_info, cfg,
                             mean, cov, nsample=3, batch_size=8)
    assert all(np.isfinite(v) for v in std.values())


def test_missing_pt_returns_none(tmp_path):
    from sln_tpu.train import checkpoint as ckpt_lib
    cfg = default_config()
    assert ckpt_lib.load_reference_checkpoint(
        str(tmp_path / "nope.pt"), cfg.model) is None
