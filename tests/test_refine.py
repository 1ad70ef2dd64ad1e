"""Refinement loop: hooks, softargmax, PSP losses, and loss decrease over a
few optimization steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sln_tpu.config import CameraConfig, DataConfig, RenderConfig, \
    default_config
from sln_tpu.workloads import common, refine


def test_softargmax_matches_reference_formula():
    # formula of reference test_render_refine.py:20-25 (cannot import that
    # module: it pulls in neural_renderer and parses argv at import time)
    x = np.random.default_rng(0).standard_normal((7, 24)).astype(np.float64)
    e = np.exp(2.0 * (x - x.max(axis=1, keepdims=True)))
    soft = e / e.sum(axis=1, keepdims=True)
    expected = (soft * np.arange(1, 25)).sum(axis=1) - 1.0
    ours = np.asarray(refine.softargmax(jnp.asarray(x.astype(np.float32))))
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-5)
    # a peaked distribution lands near its argmax
    peak = np.zeros((1, 24), np.float32)
    peak[0, 7] = 30.0
    assert abs(float(refine.softargmax(jnp.asarray(peak))[0]) - 7.0) < 1e-3


def test_fix_grad_hook():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((4, 6)).astype(np.float32))

    def loss(x):
        y = refine.fix_grad(x)
        return (y * jnp.arange(6, dtype=jnp.float32)).sum()

    g = np.asarray(jax.grad(loss)(x))
    # grads averaged between min and max halves -> translation-only
    np.testing.assert_allclose(g[:, :3], g[:, 3:], atol=1e-6)
    expected = (np.arange(3) + np.arange(3, 6)) / 2.0
    np.testing.assert_allclose(g[0], np.concatenate([expected, expected]),
                               atol=1e-6)


def test_quad_grad_hook():
    x = jnp.ones((5,))
    g = jax.grad(lambda x: refine.quad_grad(x).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 4.0 * np.ones(5))


def test_psp_losses_zero_for_identical():
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (70, 32, 32)).astype(
            np.float32))
    d, s = refine.refine_losses(img, img, sizes=(8, 16))
    assert float(d) < 1e-6
    # CE of mask-values against their own argmax is small but nonzero
    assert float(s) >= 0.0


def test_direct_box_optimization_converges():
    """The render losses must pull a perturbed layout back toward the
    target when optimizing boxes directly (decoupled from the decoder,
    which is random-init in tests)."""
    import optax
    from sln_tpu.data.vocab import OBJECT_IDX_TO_NAME
    from sln_tpu.render import assets, scene as scene_lib

    rcfg = RenderConfig(camera=CameraConfig(image_size=64), mesh_subdiv=1,
                        shell_subdiv=2)
    bank_host = assets.build_procedural_bank(1)
    bank = scene_lib.device_bank(bank_host, 2)

    O = 6
    objs = np.zeros(O, np.int32)
    objs[0] = OBJECT_IDX_TO_NAME.index("bed")
    objs[1] = OBJECT_IDX_TO_NAME.index("table")
    boxes = np.zeros((O, 6), np.float32)
    boxes[0] = [0.2, 0.0, 0.3, 0.6, 0.25, 0.75]
    boxes[1] = [0.65, 0.0, 0.35, 0.9, 0.3, 0.6]
    boxes[2] = [0, 0, 0, 4.0, 2.7, 3.5]
    mask = np.zeros(O, bool)
    mask[:3] = True
    angles = np.zeros(O, np.float32)
    room_dims = boxes[2, 3:]
    abs_boxes = boxes * np.concatenate([room_dims, room_dims])
    midx = assets.retrieve_models(jnp.asarray(objs), jnp.asarray(abs_boxes),
                                  bank_host)

    target = scene_lib.render_layout(
        jnp.asarray(objs), jnp.asarray(boxes), jnp.asarray(angles),
        jnp.asarray(mask), midx, bank, rcfg)

    # perturb the two objects
    start = boxes.copy()
    start[0, [0, 3]] += 0.18
    start[1, [2, 5]] -= 0.15

    def loss_fn(b):
        img = scene_lib.render_layout(
            jnp.asarray(objs), b, jnp.asarray(angles), jnp.asarray(mask),
            midx, bank, rcfg)
        d, s = refine.refine_losses(img, target, sizes=(16, 32))
        return d * 100.0 + s * 100.0

    tx = optax.adam(5e-3)
    b = jnp.asarray(start)
    opt = tx.init(b)

    @jax.jit
    def step(b, opt):
        l, g = jax.value_and_grad(loss_fn)(b)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(b, up), opt, l

    for _ in range(60):
        b, opt, l = step(b, opt)
    assert np.isfinite(float(l))
    # the render losses must pull the layout back toward the target
    # (the total value itself sits on a constant CE floor — what matters
    # is the box error shrinking)
    err0 = np.abs(start[:2] - boxes[:2]).mean()
    err1 = np.abs(np.asarray(b)[:2] - boxes[:2]).mean()
    assert err1 < 0.85 * err0, (err0, err1)


def test_masked_layout_iou_gt_is_one():
    """GT layout vs itself must score IoU exactly 1 over the object mask
    (and be insensitive to padded/room rows, which the mask excludes)."""
    from sln_tpu.data.augment import build_graphs

    cfg = default_config().replace(
        data=DataConfig(max_objects=10, max_triples=30, max_on_rels=10))
    val_arrays, size_info = common.load_arrays(4, cfg, synthetic_seed=5)
    batch = build_graphs(
        jax.random.PRNGKey(0), jnp.asarray(val_arrays["objs"]),
        jnp.asarray(val_arrays["boxes"]), jnp.asarray(val_arrays["angles"]),
        jnp.asarray(val_arrays["obj_mask"]),
        jnp.asarray(val_arrays["room_ids"]), size_info, max_on_rels=10)
    iou = float(refine.masked_layout_iou(
        batch.boxes, batch.angles.astype(jnp.float32), batch))
    # cuboid_iou carries a 1e-5 union epsilon, so "exactly 1" lands at
    # ~0.9999 for unit-scale boxes
    assert abs(iou - 1.0) < 1e-3, iou

    # boxes are normalized (lo, hi) corners; shrinking each box to half
    # its extent about its own center leaves it inside the GT box, so
    # IoU = (V/8) / V = 1/8 exactly for every real object
    lo, hi = batch.boxes[..., :3], batch.boxes[..., 3:]
    center, ext = (lo + hi) / 2.0, hi - lo
    shrunk = jnp.concatenate([center - ext / 4.0, center + ext / 4.0], -1)
    iou_s = float(refine.masked_layout_iou(
        shrunk, batch.angles.astype(jnp.float32), batch))
    assert abs(iou_s - 0.125) < 1e-3, iou_s


def test_refine_loop_runs_and_writes_artifacts(tmp_path):
    import dataclasses
    cfg = default_config()
    cfg = cfg.replace(
        data=DataConfig(max_objects=12, max_triples=36, max_on_rels=12),
        render=RenderConfig(camera=CameraConfig(image_size=64),
                            mesh_subdiv=1, shell_subdiv=2),
        refine=dataclasses.replace(default_config().refine, render_size=64))
    val_arrays, size_info = common.load_arrays(6, cfg, synthetic_seed=3)

    import jax
    from sln_tpu.data.augment import build_graphs
    from sln_tpu.models.vae import Sg2ScVAE
    example = build_graphs(
        jax.random.PRNGKey(0), jnp.asarray(val_arrays["objs"][:1]),
        jnp.asarray(val_arrays["boxes"][:1]),
        jnp.asarray(val_arrays["angles"][:1]),
        jnp.asarray(val_arrays["obj_mask"][:1]),
        jnp.asarray(val_arrays["room_ids"][:1]), size_info,
        max_on_rels=cfg.data.max_on_rels)
    model = Sg2ScVAE(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), example, None, False)

    room_id = str(int(val_arrays["room_ids"][0]))
    hist = refine.finetune_rooms(model, variables, val_arrays, size_info,
                                 cfg, [room_id], [str(tmp_path / room_id)],
                                 num_iters=12, save_semantic=True)
    losses = [h["total"] for h in hist[room_id]]
    assert all(np.isfinite(losses))
    # with random-init decoder weights the loop cannot be expected to
    # converge (the reference refines a trained model); mechanics only:
    # z and params must actually change, losses stay finite
    # artifacts (the reference set: pkls + depth/class single-frame GIFs,
    # test_render_refine.py:369-377, save_images :144-163)
    import os
    d = tmp_path / room_id
    assert (d / "z_value.pkl").exists()
    assert (d / "bbox_rot_0.pkl").exists()
    assert (d / "target_depth.png").exists()
    assert (d / "000_depth.gif").exists()
    assert (d / "011_depth.gif").exists()
    class_gifs = [f for f in os.listdir(d)
                  if f.startswith("011_") and f.endswith(".gif")
                  and "depth" not in f]
    assert class_gifs, "per-class mask GIFs missing"


def test_batched_rooms_decouple_with_frozen_params():
    """B>1 batched refinement shares ONE set of model params across rooms
    (a documented deviation: the reference fine-tunes params per room,
    test_render_refine.py:286). With lr_model_scale=0 (params frozen) the
    rooms must fully decouple: each z row of a B=3 run equals the z of
    its own B=1 run. This pins both that z gradients never mix across
    rooms AND that the only cross-room coupling is the shared-params
    update."""
    import dataclasses

    import jax
    import optax

    from sln_tpu.data.augment import build_graphs
    from sln_tpu.models.vae import Sg2ScVAE
    from sln_tpu.render import assets, scene as scene_lib

    cfg = default_config()
    cfg = cfg.replace(
        data=DataConfig(max_objects=10, max_triples=30, max_on_rels=10),
        render=RenderConfig(camera=CameraConfig(image_size=32),
                            mesh_subdiv=0, shell_subdiv=1),
        refine=dataclasses.replace(default_config().refine,
                                   render_size=32, pyramid_sizes=(16, 32),
                                   lr_model_scale=0.0,
                                   # noise draws depend on the batch
                                   # SHAPE (normal(key, (B, O)) row b !=
                                   # normal(key, (1, O))), so zero it for
                                   # the cross-batch-size comparison
                                   angle_noise_scale=0.0))
    val_arrays, size_info = common.load_arrays(8, cfg, synthetic_seed=5)
    B = 3

    def make_batch(sl):
        return build_graphs(
            jax.random.PRNGKey(0), jnp.asarray(val_arrays["objs"][sl]),
            jnp.asarray(val_arrays["boxes"][sl]),
            jnp.asarray(val_arrays["angles"][sl]),
            jnp.asarray(val_arrays["obj_mask"][sl]),
            jnp.asarray(val_arrays["room_ids"][sl]), size_info,
            max_on_rels=cfg.data.max_on_rels)

    bank_host = assets.build_procedural_bank(0)
    bank = scene_lib.device_bank(bank_host, 1)
    rcfg = dataclasses.replace(cfg.render, camera=dataclasses.replace(
        cfg.render.camera, image_size=32))

    model = Sg2ScVAE(cfg.model)

    def run(sl, steps=4):
        batch = make_batch(sl)
        nb = batch.objs.shape[0]
        variables = model.init(jax.random.PRNGKey(0), batch, None, False)
        inputs = refine.prepare_refine_inputs(batch, bank_host, bank, rcfg)
        tx, _, _, run_scan = refine.make_refine_step(
            model, variables.get("batch_stats", {}), batch, inputs[0],
            bank, inputs[1], inputs[2], inputs[3], cfg)
        z0 = jnp.zeros((nb, batch.max_objects, cfg.model.latent_dim))
        opt = tx.init((z0, variables["params"]))
        state = refine.RefineState(z0, variables["params"], opt,
                                   jnp.zeros((), jnp.int32))
        keys = jnp.stack([jax.random.PRNGKey(7)] * steps)  # same key/iter
        state, _ = run_scan(state, keys)
        return np.asarray(state.z)

    # NOTE: per-room keys must match between the joint and single runs,
    # hence the constant key stack (angle noise is the only rng consumer)
    z_joint = run(slice(0, B))
    for b in range(B):
        z_single = run(slice(b, b + 1))
        np.testing.assert_allclose(z_joint[b], z_single[0], rtol=2e-5,
                                   atol=2e-6)
