"""Component breakdown of the 256px refinement step (tunnel-safe).

Times, each as ONE lax.scan ending in a fetched checksum with per-step
varying inputs (so XLA cannot hoist the thing being measured — the
scan-probe pitfall in CLAUDE.md):

  decode        VAE decode fwd (z varies per step)
  render_fwd    decode + vmapped rasterizer forward
  render_fwdbwd value_and_grad of (decode + render + sum) wrt z
  full_step     the real refine step (decode + render + pyramid losses +
                fwd/bwd + SGD update) — the bench number

The deltas attribute the per-step cost: rasterizer fwd = render_fwd -
decode; rasterizer bwd + losses = full_step - render_fwd (approx, the
pyramid losses are a few matmuls).

Usage: python tools/profile_refine_breakdown.py [--render_size 256]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed_scan(fn, state0, steps, label):
    """fn: (carry, key) -> (carry, checksum-able). Returns steps/sec."""
    import jax

    keys = jax.random.split(jax.random.PRNGKey(0), steps)

    @jax.jit
    def run(state, keys):
        return jax.lax.scan(fn, state, keys)

    out = run(state0, keys)
    float(jax.tree.leaves(out)[0].sum())          # compile + warm, sync
    rate = 0.0
    for w in range(2):
        kw = jax.random.split(jax.random.PRNGKey(w + 1), steps)
        t0 = time.perf_counter()
        out = run(state0, kw)
        float(jax.tree.leaves(out)[0].sum())
        rate = max(rate, steps / (time.perf_counter() - t0))
    print(f"{label:16} {rate:8.1f} steps/s   {1e3 / rate:7.3f} ms/step",
          flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--render_size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=120)
    args = ap.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from sln_tpu.config import DataConfig, default_config
    from sln_tpu.models.vae import Sg2ScVAE
    from sln_tpu.render import assets, scene as scene_lib
    from sln_tpu.workloads import refine
    from bench import _refine_batch, _refine_scan

    cfg = default_config().replace(
        data=DataConfig(max_objects=16, max_triples=48, max_on_rels=16))
    cfg = cfg.replace(refine=dc.replace(cfg.refine,
                                        render_size=args.render_size))
    batch = _refine_batch(cfg, 1, synthetic_seed=3)
    model = Sg2ScVAE(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch, None, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    z0 = jnp.zeros((1, batch.max_objects, cfg.model.latent_dim))

    rcfg = dc.replace(cfg.render, camera=dc.replace(
        cfg.render.camera, image_size=args.render_size))
    bank_host = assets.build_procedural_bank(cfg.render.mesh_subdiv)
    bank = scene_lib.device_bank(bank_host, cfg.render.shell_subdiv)
    midx, target, size_t, room_row = refine.prepare_refine_inputs(
        batch, bank_host, bank, rcfg)

    F = int(bank.faces.shape[0]) if hasattr(bank, "faces") else -1
    print(f"render_size={args.render_size} max_objects={batch.max_objects}",
          flush=True)

    def decode_fn(z, key):
        # z varies per step (carry update from the key) so the decode
        # cannot hoist
        zz = z + jax.random.normal(key, z.shape) * 1e-4
        boxes, angle_lp = model.apply(
            {"params": params, "batch_stats": batch_stats}, zz, batch,
            False, method=Sg2ScVAE.decode)
        return zz, boxes, angle_lp

    def decode_only(z, key):
        zz, boxes, angle_lp = decode_fn(z, key)
        return zz + 1e-30 * (boxes.sum() + angle_lp.sum()), ()

    timed_scan(decode_only, z0, args.steps, "decode")

    render_batch = jax.vmap(
        lambda o, b, a, m, mi: scene_lib.render_layout(
            o, b, a, m, mi, bank, rcfg))

    def render_fwd(z, key):
        zz, boxes, angle_lp = decode_fn(z, key)
        ang = refine.softargmax(angle_lp, cfg.refine.softargmax_beta)
        imgs = render_batch(batch.objs, boxes, ang, batch.obj_mask, midx)
        return zz + 1e-30 * imgs.sum(), ()

    timed_scan(render_fwd, z0, args.steps, "render_fwd")

    def render_loss(z, key):
        zz, boxes, angle_lp = decode_fn(z, key)
        ang = refine.softargmax(angle_lp, cfg.refine.softargmax_beta)
        imgs = render_batch(batch.objs, boxes, ang, batch.obj_mask, midx)
        return zz, imgs.sum()

    def render_fwdbwd(z, key):
        def f(zi):
            _, s = render_loss(zi, key)
            return s
        g = jax.grad(f)(z)
        zz = z + jax.random.normal(key, z.shape) * 1e-4 + 1e-30 * g
        return zz, ()

    timed_scan(render_fwdbwd, z0, args.steps, "render_fwdbwd")

    # --- loss side: fixed rendered image perturbed per step ---
    tg_pyr = jax.vmap(lambda tt: refine.target_pyramids(
        tt, cfg.refine.pyramid_sizes))(target)

    def _losses(img):
        d, s = jax.vmap(lambda i, tg: refine.refine_losses_pre(
            i, *tg, cfg.refine.pyramid_sizes))(img, tg_pyr)
        return d.mean() + s.mean()

    img0 = jnp.zeros_like(target)

    def loss_fwd(img, key):
        im = img + jax.random.normal(key, (1, 1, 1, 1)) * 1e-4
        return img, _losses(im)

    timed_scan(loss_fwd, img0, args.steps, "loss_fwd")

    def loss_fwdbwd(img, key):
        im = img + jax.random.normal(key, (1, 1, 1, 1)) * 1e-4
        g = jax.grad(_losses)(im)
        return img + 1e-30 * g, ()

    timed_scan(loss_fwdbwd, img0, args.steps, "loss_fwdbwd")

    # --- composite fwd+bwd without the optax update ---
    from sln_tpu.workloads.refine import (fix_grad, quad_grad, softargmax,
                                          refine_losses_pre)

    render_b2 = jax.vmap(
        lambda o, b, a, m, mi: scene_lib.render_layout(
            o, b, a, m, mi, bank, rcfg))

    def total_loss(z, key):
        boxes, angle_lp = model.apply(
            {"params": params, "batch_stats": batch_stats}, z, batch,
            False, method=Sg2ScVAE.decode)
        ang = softargmax(angle_lp, cfg.refine.softargmax_beta)
        imgs = render_b2(batch.objs, boxes, ang, batch.obj_mask, midx)
        return _losses(imgs)

    def composite_fwdbwd(z, key):
        g = jax.grad(total_loss)(z, key)
        zz = z + jax.random.normal(key, z.shape) * 1e-4 + 1e-30 * g
        return zz, ()

    timed_scan(composite_fwdbwd, z0, args.steps, "composite_fwdbwd")

    # --- bisect the full step: exact forward (all hooks + size losses),
    # grads wrt z only vs (z, params); then + a poor-man's update ---
    import optax

    from sln_tpu.data import synthetic  # noqa: F401  (parity of imports)

    room_mask = batch.room_mask
    renderable = (jnp.asarray(scene_lib.OBJ_RENDERABLE)[batch.objs]
                  & batch.obj_mask & ~room_mask)
    angles_gt_f = batch.angles.astype(jnp.float32)
    ref = cfg.refine

    def forward_exact(z, p, key):
        boxes, angle_lp = model.apply(
            {"params": p, "batch_stats": batch_stats}, z, batch, False,
            method=Sg2ScVAE.decode)
        boxes = refine.fix_grad(boxes)
        boxes = jnp.where(room_mask[..., None], room_row, boxes)
        ang = refine.softargmax(angle_lp, ref.softargmax_beta)
        ang = ang + jax.random.normal(key, ang.shape) * ref.angle_noise_scale
        ang = refine.quad_grad(ang)
        ang = jnp.where(room_mask, angles_gt_f, ang)
        imgs = render_b2(batch.objs, boxes, ang, batch.obj_mask, midx)
        d, s = jax.vmap(lambda i, tg: refine.refine_losses_pre(
            i, *tg, ref.pyramid_sizes))(imgs, tg_pyr)
        room_dims = room_row[:, 0, 3:]
        abs_size = (boxes[..., 3:] - boxes[..., :3]) * room_dims[:, None, :]
        size_loss = (jnp.square(abs_size - size_t)
                     * renderable[..., None]).sum(axis=(1, 2)) / 3.0
        wall_sq = jnp.square(boxes - room_row)
        wall = ((wall_sq * room_mask[..., None]).sum(axis=(1, 2))
                / (room_mask.sum(axis=1) * 6.0))
        return (d.mean() * 2.0 * ref.depth_loss_weight
                + s.mean() * 800.0 * ref.semantic_loss_weight
                + (size_loss + wall).mean() * ref.size_loss_weight)

    def exact_z(zc, key):
        g = jax.grad(forward_exact)(zc, params, key)
        return zc - 1e-6 * g, ()

    timed_scan(exact_z, z0, args.steps, "exact_grad_z")

    # --- bisect composite (1.2 ms) -> exact (3.0 ms): which addition? ---
    def forward_ablate(z, p, key, hooks=True, noise=True, size=True,
                       weights=True):
        boxes, angle_lp = model.apply(
            {"params": p, "batch_stats": batch_stats}, z, batch, False,
            method=Sg2ScVAE.decode)
        if hooks:
            boxes = refine.fix_grad(boxes)
        boxes = jnp.where(room_mask[..., None], room_row, boxes)
        ang = refine.softargmax(angle_lp, ref.softargmax_beta)
        if noise:
            ang = ang + (jax.random.normal(key, ang.shape)
                         * ref.angle_noise_scale)
        if hooks:
            ang = refine.quad_grad(ang)
        ang = jnp.where(room_mask, angles_gt_f, ang)
        imgs = render_b2(batch.objs, boxes, ang, batch.obj_mask, midx)
        d, s = jax.vmap(lambda i, tg: refine.refine_losses_pre(
            i, *tg, ref.pyramid_sizes))(imgs, tg_pyr)
        d, s = d.mean(), s.mean()
        total = (d * 2.0 * ref.depth_loss_weight
                 + s * 800.0 * ref.semantic_loss_weight) if weights \
            else d + s
        if size:
            room_dims = room_row[:, 0, 3:]
            abs_size = ((boxes[..., 3:] - boxes[..., :3])
                        * room_dims[:, None, :])
            size_loss = (jnp.square(abs_size - size_t)
                         * renderable[..., None]).sum(axis=(1, 2)) / 3.0
            wall_sq = jnp.square(boxes - room_row)
            wall = ((wall_sq * room_mask[..., None]).sum(axis=(1, 2))
                    / (room_mask.sum(axis=1) * 6.0))
            total = total + (size_loss + wall).mean() * ref.size_loss_weight
        return total

    import functools as ft

    for name, kw in (("abl_nohooks", dict(hooks=False)),
                     ("abl_nonoise", dict(noise=False)),
                     ("abl_nosize", dict(size=False)),
                     ("abl_noweights", dict(weights=False)),
                     ("abl_all_on", dict())):
        fa = ft.partial(forward_ablate, **kw)

        def abl(zc, key, fa=fa):
            g = jax.grad(lambda zz: fa(zz, params, key))(zc)
            return zc - 1e-6 * g, ()

        timed_scan(abl, z0, args.steps, name)

    def exact_zp(carry, key):
        zc, pc = carry
        gz, gp = jax.grad(forward_exact, argnums=(0, 1))(zc, pc, key)
        zc = zc - 1e-6 * gz
        pc = jax.tree.map(lambda a, b: a - 1e-6 * b, pc, gp)
        return (zc, pc), ()

    timed_scan(exact_zp, (z0, params), args.steps, "exact_grad_zp")

    tx2 = optax.multi_transform(
        {"z": optax.sgd(ref.lr_z, momentum=ref.momentum,
                        nesterov=ref.nesterov),
         "params": optax.sgd(cfg.train.learning_rate * ref.lr_model_scale,
                             momentum=ref.momentum, nesterov=ref.nesterov)},
        ("z", "params"))

    def exact_opt(carry, key):
        zc, pc, opt = carry
        gz, gp = jax.grad(forward_exact, argnums=(0, 1))(zc, pc, key)
        updates, opt = tx2.update((gz, gp), opt, (zc, pc))
        zc, pc = optax.apply_updates((zc, pc), updates)
        return (zc, pc, opt), ()

    timed_scan(exact_opt, (z0, params, tx2.init((z0, params))),
               args.steps, "exact_grad_zp_opt")

    # --- exact replica of refine._step_inner (aux tuple incl imgs,
    # RefineState carry, aux-dict ys) to close the remaining gap ---
    def forward_ref(z, p, key):
        boxes, angle_lp = model.apply(
            {"params": p, "batch_stats": batch_stats}, z, batch, False,
            method=Sg2ScVAE.decode)
        boxes = refine.fix_grad(boxes)
        boxes = jnp.where(room_mask[..., None], room_row, boxes)
        ang = refine.softargmax(angle_lp, ref.softargmax_beta)
        ang = ang + jax.random.normal(key, ang.shape) * ref.angle_noise_scale
        ang = refine.quad_grad(ang)
        ang = jnp.where(room_mask, angles_gt_f, ang)
        imgs = render_b2(batch.objs, boxes, ang, batch.obj_mask, midx)
        d, s = jax.vmap(lambda i, tg: refine.refine_losses_pre(
            i, *tg, ref.pyramid_sizes))(imgs, tg_pyr)
        d, s = d.mean(), s.mean()
        room_dims = room_row[:, 0, 3:]
        abs_size = (boxes[..., 3:] - boxes[..., :3]) * room_dims[:, None, :]
        size_loss = (jnp.square(abs_size - size_t)
                     * renderable[..., None]).sum(axis=(1, 2)) / 3.0
        wall_sq = jnp.square(boxes - room_row)
        wall = ((wall_sq * room_mask[..., None]).sum(axis=(1, 2))
                / (room_mask.sum(axis=1) * 6.0))
        size_total = (size_loss + wall).mean()
        total = (d * 2.0 * ref.depth_loss_weight
                 + s * 800.0 * ref.semantic_loss_weight
                 + size_total * ref.size_loss_weight)
        aux = {"depth_loss": d, "semantic_loss": s,
               "size_loss": size_total, "total": total}
        return total, (aux, imgs, boxes, ang)

    def step_repro(state, key):
        z, p, opt, st = state
        (total, (aux, img, boxes, ang)), grads = jax.value_and_grad(
            forward_ref, argnums=(0, 1), has_aux=True)(z, p, key)
        updates, opt = tx2.update((grads[0], grads[1]), opt, (z, p))
        nz, np_ = optax.apply_updates((z, p), updates)
        return (nz, np_, opt, st + 1), aux

    timed_scan(step_repro,
               (z0, params, tx2.init((z0, params)),
                jnp.zeros((), jnp.int32)),
               args.steps, "step_repro")

    # same but the forward returns only the scalar aux dict (no imgs /
    # boxes / ang in has_aux) — does the dead 18 MB aux output cost?
    def forward_ref_slim(z, p, key):
        total, (aux, _, _, _) = forward_ref(z, p, key)
        return total, aux

    def step_slim(state, key):
        z, p, opt, st = state
        (total, aux), grads = jax.value_and_grad(
            forward_ref_slim, argnums=(0, 1), has_aux=True)(z, p, key)
        updates, opt = tx2.update((grads[0], grads[1]), opt, (z, p))
        nz, np_ = optax.apply_updates((z, p), updates)
        return (nz, np_, opt, st + 1), aux

    timed_scan(step_slim,
               (z0, params, tx2.init((z0, params)),
                jnp.zeros((), jnp.int32)),
               args.steps, "step_slim_aux")

    # the real thing
    run_scan, _, state = _refine_scan(cfg, batch, model, batch_stats,
                                      params, z0)
    keys = jax.random.split(jax.random.PRNGKey(0), args.steps)
    s2, _ = run_scan(state, keys)
    float(s2.z.sum())
    rate = 0.0
    for w in range(2):
        kw = jax.random.split(jax.random.PRNGKey(w + 1), args.steps)
        t0 = time.perf_counter()
        s2, _ = run_scan(state, kw)
        float(s2.z.sum())
        rate = max(rate, args.steps / (time.perf_counter() - t0))
    print(f"{'full_step':16} {rate:8.1f} steps/s   {1e3 / rate:7.3f} "
          f"ms/step", flush=True)


if __name__ == "__main__":
    main()
