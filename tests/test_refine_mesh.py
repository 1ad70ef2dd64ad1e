"""Multi-chip SPMD refinement serving: B independent rooms sharded over
the mesh data axis must optimize identically to the single-device batched
run (conftest provides 8 virtual CPU devices). Covers
refine.shard_refine_inputs + the sharding-propagation contract of
make_refine_step's scanned program."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from sln_tpu.config import DataConfig, default_config
from sln_tpu.data.augment import build_graphs
from sln_tpu.models.vae import Sg2ScVAE
from sln_tpu.parallel import mesh as meshlib
from sln_tpu.render import assets, scene as scene_lib
from sln_tpu.workloads import common, refine

B, STEPS, SIZE = 8, 4, 48


def _setup():
    cfg = default_config().replace(
        data=DataConfig(max_objects=8, max_triples=24, max_on_rels=8))
    cfg = cfg.replace(refine=dc.replace(cfg.refine, render_size=SIZE,
                                        pyramid_sizes=(16, 32)))
    val_arrays, size_info = common.load_arrays(B, cfg, synthetic_seed=3)
    batch = build_graphs(
        jax.random.PRNGKey(0), jnp.asarray(val_arrays["objs"]),
        jnp.asarray(val_arrays["boxes"]),
        jnp.asarray(val_arrays["angles"]),
        jnp.asarray(val_arrays["obj_mask"]),
        jnp.asarray(val_arrays["room_ids"]), size_info, max_on_rels=8)
    model = Sg2ScVAE(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    bank_host = assets.build_procedural_bank(0)
    bank = scene_lib.device_bank(bank_host, 1)
    rcfg = dc.replace(cfg.render, camera=dc.replace(
        cfg.render.camera, image_size=SIZE))
    midx, target, size_t, room_row = refine.prepare_refine_inputs(
        batch, bank_host, bank, rcfg)
    z0 = jnp.zeros((B, batch.max_objects, cfg.model.latent_dim))
    return (cfg, model, variables, batch, midx, bank, target, size_t,
            room_row, z0)


def _run(cfg, model, variables, batch, midx, bank, target, size_t,
         room_row, z0, params):
    tx, _, _, run_scan = refine.make_refine_step(
        model, variables.get("batch_stats", {}), batch, midx, bank,
        target, size_t, room_row, cfg)
    opt = tx.init((z0, params))
    state = refine.RefineState(z0, params, opt, jnp.zeros((), jnp.int32))
    keys = jax.random.split(jax.random.PRNGKey(0), STEPS)
    s2, hist = run_scan(state, keys)
    return np.asarray(s2.z), np.asarray(hist["total"])


def test_sharded_refinement_matches_single_device():
    setup = _setup()
    (cfg, model, variables, batch, midx, bank, target, size_t,
     room_row, z0) = setup
    z_ref, hist_ref = _run(cfg, model, variables, batch, midx, bank,
                           target, size_t, room_row, z0,
                           variables["params"])

    mesh = meshlib.make_mesh(num_data=4)
    (batch_s, midx_s, target_s, size_s, row_s, z0_s,
     params_s) = refine.shard_refine_inputs(
        mesh, batch, midx, target, size_t, room_row, z0,
        variables["params"])
    z_sh, hist_sh = _run(cfg, model, variables, batch_s, midx_s, bank,
                         target_s, size_s, row_s, z0_s, params_s)

    assert np.isfinite(z_sh).all()
    np.testing.assert_allclose(z_sh, z_ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(hist_sh, hist_ref, rtol=2e-4, atol=2e-5)
