"""Model configuration variants: recurrent gconv, use_AE, no-norm MLPs,
eval-mode train step."""

import numpy as np
import jax
import jax.numpy as jnp

from sln_tpu.config import ModelConfig, default_config
from sln_tpu.models.vae import Sg2ScVAE
from tests.test_model_parity import make_ragged_scenes, pad_scenes


def _batch():
    rng = np.random.default_rng(0)
    return pad_scenes(make_ragged_scenes(rng, [5, 7]), O=8, T=20)


def _run(cfg: ModelConfig):
    model = Sg2ScVAE(cfg)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch,
                           jax.random.PRNGKey(1), True)
    (mu, logvar, boxes, angles), _ = model.apply(
        variables, batch, jax.random.PRNGKey(2), True,
        mutable=["batch_stats"])
    assert boxes.shape == (2, 8, 6)
    assert angles.shape == (2, 8, 24)
    assert np.isfinite(np.asarray(boxes)).all()
    return mu, logvar, boxes


def test_recurrent_gconv_mode():
    _run(ModelConfig(gconv_mode="recurrent"))


def test_no_batchnorm():
    _run(ModelConfig(mlp_normalization="none"))


def test_bfloat16_compute_close_to_fp32():
    """ModelConfig.compute_dtype='bfloat16' (params fp32, fp32 outputs)
    must track the fp32 path: boxes are normalized [0,1]-ish so 2e-2 abs
    is below any eval-metric threshold."""
    batch = _batch()
    m32 = Sg2ScVAE(ModelConfig())
    m16 = Sg2ScVAE(ModelConfig(compute_dtype="bfloat16"))
    variables = m32.init(jax.random.PRNGKey(0), batch, None, False)
    mu32, lv32, b32, a32 = m32.apply(variables, batch, None, False)
    mu16, lv16, b16, a16 = m16.apply(variables, batch, None, False)
    assert b16.dtype == jnp.float32 and mu16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(b16), np.asarray(b32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(mu16), np.asarray(mu32),
                               atol=5e-2)


def test_use_ae_mode():
    cfg = ModelConfig(use_ae=True)
    model = Sg2ScVAE(cfg)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    mu, logvar, boxes1, _ = model.apply(variables, batch,
                                        jax.random.PRNGKey(1), False)
    _, _, boxes2, _ = model.apply(variables, batch,
                                  jax.random.PRNGKey(2), False)
    # AE mode: z = mu, no sampling -> deterministic decode
    np.testing.assert_array_equal(np.asarray(boxes1), np.asarray(boxes2))


def test_eval_mode_train_step_freezes_bn():
    from sln_tpu.data import synthetic, tensorize
    from sln_tpu.data.augment import SizeInfo, build_graphs
    from sln_tpu.train import loop as train_loop

    cfg = default_config()
    cfg = cfg.replace(train=cfg.train.__class__(batch_size=8))
    rooms = synthetic.generate_rooms(8, seed=0)
    arrays = tensorize.tensorize_rooms(rooms, cfg.data.max_objects)
    t, m, a = synthetic.default_size_table(64, seed=1)
    size_info = SizeInfo(jnp.asarray(t), jnp.asarray(m), jnp.asarray(a))
    example = build_graphs(jax.random.PRNGKey(0),
                           jnp.asarray(arrays["objs"][:8]),
                           jnp.asarray(arrays["boxes"][:8]),
                           jnp.asarray(arrays["angles"][:8]),
                           jnp.asarray(arrays["obj_mask"][:8]),
                           jnp.asarray(arrays["room_ids"][:8]), size_info)
    model, state, tx = train_loop.create_state(cfg, jax.random.PRNGKey(0),
                                               example)
    eval_step = train_loop.make_train_step(model, tx, cfg, size_info,
                                           eval_mode=True)
    raw = next(train_loop.batches_from_arrays(arrays, 8,
                                              np.random.default_rng(0)))
    stats_before = jax.tree.map(np.asarray, state.batch_stats)
    params_before = jax.tree.map(np.asarray, state.params)
    state2, losses = eval_step(state, raw, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total_loss"]))
    # BN statistics unchanged in eval mode...
    for a_, b_ in zip(jax.tree.leaves(stats_before),
                      jax.tree.leaves(state2.batch_stats)):
        np.testing.assert_array_equal(a_, np.asarray(b_))
    # ...but parameters still update
    changed = any(
        not np.array_equal(x, np.asarray(y))
        for x, y in zip(jax.tree.leaves(params_before),
                        jax.tree.leaves(state2.params)))
    assert changed
