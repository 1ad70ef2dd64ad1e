"""Jitted SPMD training step + epoch driver.

Replaces the reference train loop (train.py:56-114): one fused XLA program
per step that (1) builds the stochastic scene graphs on device, (2) runs the
VAE forward, (3) assembles masked losses with the KL schedule, (4) applies
Adam with a NaN-skip guard, all sharded over the data axis of an ICI mesh.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sln_tpu.config import Config
from sln_tpu.data.augment import SizeInfo, build_graphs
from sln_tpu.data.batch import SceneBatch
from sln_tpu.models.vae import Sg2ScVAE
from sln_tpu.train.losses import vae_losses


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray          # () int32


class RawBatch(NamedTuple):
    """Tensorized scenes before on-device graph augmentation."""
    objs: jnp.ndarray          # (B, O) int32
    boxes: jnp.ndarray         # (B, O, 6) float32
    angles: jnp.ndarray        # (B, O) int32
    obj_mask: jnp.ndarray      # (B, O) bool
    room_ids: jnp.ndarray      # (B,) int32


def kl_weight_at(step: jnp.ndarray, cfg) -> jnp.ndarray:
    """Constant or staircase-decay KL weight (reference train.py:73-76)."""
    if cfg.kl_linear_decay:
        return 10.0 ** (step // 100_000 - 6).astype(jnp.float32)
    return jnp.float32(cfg.kl_loss_weight)


def create_state(cfg: Config, rng: jax.Array,
                 example: SceneBatch) -> Tuple[Sg2ScVAE, TrainState,
                                               optax.GradientTransformation]:
    model = Sg2ScVAE(cfg.model)
    variables = model.init(rng, example, None, False)
    tx = optax.adam(cfg.train.learning_rate)
    opt_state = tx.init(variables["params"])
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    return model, state, tx


def make_train_step(model: Sg2ScVAE, tx: optax.GradientTransformation,
                    cfg: Config, size_info: SizeInfo,
                    eval_mode: bool = False, staged: bool = False,
                    batch_sharding=None
                    ) -> Callable[[TrainState, RawBatch, jax.Array],
                                  Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted step. size_info is closed over as device constants.

    eval_mode=True keeps optimizing parameters but runs the model with
    frozen BatchNorm statistics — the reference's `model.eval()` switch at
    --eval_mode_after (train.py:63-65).

    staged=True returns a step with signature (state, staged_arrays:
    RawBatch over the WHOLE dataset, idx: (B,) int32, rng): the batch is
    gathered ON DEVICE from dataset arrays that were device_put once, so
    the only per-step host->device transfer is the index vector + rng.
    This is the single-host fast path — per-step uploads of the batch
    itself leak host RSS over the axon tunnel (CLAUDE.md gotcha: the r3
    SPADE trainer was OOM-killed by exactly this) and pay ~batch-size of
    H2D every step. The staged arrays are jit ARGUMENTS, not closures
    (closures bake them into the program as constants — the HTTP-413
    remote-compile gotcha). batch_sharding (optional NamedSharding)
    constrains the gathered batch so a multi-device mesh still shards
    the batch axis over its data axes.

    cfg.train.microbatch > 0 runs the step as gradient accumulation over
    batch-chunks of that size (one lax.scan, one optimizer update);
    chunk gradients are weighted by valid-object counts, which makes the
    vae_losses normalization exact across unequal chunks. The remaining
    deviations from the unchunked step are the standard gradient-
    accumulation semantics: train-mode BatchNorm normalizes each chunk by
    its own batch statistics (with eval_mode=True / frozen BN and
    kl_free_bits=0 the full-batch mean gradient is exactly reproduced),
    and the free-bits per-dim floor applies per chunk. The incoming batch
    size must be a multiple of microbatch. microbatch == 0 or >= batch is
    the unchunked fast path (identical numerics and rng stream to the
    pre-microbatch implementation).
    """

    max_on = cfg.data.max_on_rels
    use_attr_30 = cfg.data.use_attr_30
    use_ae = cfg.model.use_ae
    train_flag = not eval_mode
    microbatch = cfg.train.microbatch

    def step_fn(state: TrainState, raw: RawBatch, rng: jax.Array):
        B = raw.objs.shape[0]
        mb = microbatch if 0 < microbatch < B else B
        if B % mb:
            raise ValueError(f"batch size {B} is not divisible by "
                             f"train.microbatch {mb}")
        k = B // mb
        kl_w = kl_weight_at(state.step + 1, cfg.train)

        def chunk_grads(batch_stats, chunk: RawBatch, rng_graph, rng_z):
            """(grads, total, losses, new_stats, n_valid) for one
            microbatch; n_valid is the chunk's valid-object count — the
            normalizer every vae_losses term uses (losses.py n_valid)."""
            batch = build_graphs(rng_graph, chunk.objs, chunk.boxes,
                                 chunk.angles, chunk.obj_mask,
                                 chunk.room_ids, size_info,
                                 max_on_rels=max_on,
                                 use_attr_30=use_attr_30)

            def loss_fn(params):
                (mu, logvar, boxes_pred, angle_lp), mut = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch, rng_z, train_flag, mutable=["batch_stats"])
                total, losses = vae_losses(batch, mu, logvar, boxes_pred,
                                           angle_lp, kl_w, use_ae,
                                           cfg.train.kl_free_bits)
                return total, (losses, mut.get("batch_stats", {}))

            (total, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            n_valid = jnp.maximum(
                batch.obj_mask.astype(jnp.float32).sum(), 1.0)
            return grads, total, losses, new_stats, n_valid

        if k == 1:
            # unchunked fast path: no scan, no accumulator tree, and the
            # pre-microbatch rng stream (split(fold_in(rng, step))) so
            # default-config training stays bit-reproducible against
            # recorded runs
            rng_graph, rng_z = jax.random.split(
                jax.random.fold_in(rng, state.step))
            grads, total, losses, new_stats, _ = chunk_grads(
                state.batch_stats, raw, rng_graph, rng_z)
        else:
            chunks = jax.tree.map(
                lambda a: a.reshape((k, mb) + a.shape[1:]), raw)
            rng_step = jax.random.fold_in(rng, state.step)

            def scan_body(carry, chunk_and_idx):
                batch_stats, grads_acc, total_acc, n_acc = carry
                chunk, idx = chunk_and_idx
                rng_graph, rng_z = jax.random.split(
                    jax.random.fold_in(rng_step, idx))
                grads, total, losses, new_stats, n = chunk_grads(
                    batch_stats, chunk, rng_graph, rng_z)
                grads_acc = jax.tree.map(lambda a, g: a + n * g,
                                         grads_acc, grads)
                stats = new_stats if new_stats else batch_stats
                return ((stats, grads_acc, total_acc + n * total,
                         n_acc + n),
                        jax.tree.map(lambda v: n * v, losses))

            # Every vae_losses term is a masked sum divided by the
            # chunk's valid-object count, so weighting each chunk's
            # gradient by that count and dividing by the batch total
            # makes the loss normalization exact across unequal chunks
            # (see the docstring for the BN/free-bits accumulation
            # semantics). Each fwd/bwd runs at the mb<=256 shape where
            # the fused pipeline stays inside the VMEM window (CLAUDE.md
            # perf notes / tools/profile_batch_scaling.py). BN running
            # statistics thread sequentially through the chunks, exactly
            # as k successive minibatches would.
            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, p.dtype), state.params)
            (new_stats, grads, total, n_total), losses = jax.lax.scan(
                scan_body,
                (state.batch_stats, zero_grads, jnp.float32(0),
                 jnp.float32(0)),
                (chunks, jnp.arange(k, dtype=jnp.int32)))
            grads = jax.tree.map(lambda g: g / n_total, grads)
            total = total / n_total
            losses = jax.tree.map(lambda v: v.sum(0) / n_total, losses)

        # NaN guard: skip the whole update on non-finite loss
        # (reference train.py:79-81).
        finite = jnp.isfinite(total)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def pick(new, old):
            return jax.tree.map(
                lambda a, b: jnp.where(finite, a, b), new, old)

        new_state = TrainState(
            params=pick(new_params, state.params),
            batch_stats=pick(new_stats, state.batch_stats) if new_stats
            else state.batch_stats,
            opt_state=pick(new_opt, state.opt_state),
            step=state.step + 1)
        losses = dict(losses)
        losses["skipped_nan"] = (~finite).astype(jnp.float32)
        return new_state, losses

    if staged:
        def staged_step(state: TrainState, staged_arrays: RawBatch,
                        idx: jnp.ndarray, rng: jax.Array):
            raw = RawBatch(*(a[idx] for a in staged_arrays))
            if batch_sharding is not None:
                raw = jax.tree.map(
                    lambda a: jax.lax.with_sharding_constraint(
                        a, batch_sharding), raw)
            return step_fn(state, raw, rng)

        return jax.jit(staged_step, donate_argnums=(0,))

    return jax.jit(step_fn, donate_argnums=(0,))


def make_train_scan(model: Sg2ScVAE, tx: optax.GradientTransformation,
                    cfg: Config, size_info: SizeInfo,
                    eval_mode: bool = False):
    """Many train steps in ONE device program: (state, raw, rng, n) ->
    (state, summed total_loss over the n steps).

    The per-step math is exactly make_train_step's (the scan body calls
    the same inner step; rng folds with state.step, which increments
    every iteration, so each step draws fresh graphs/z and the weights
    advance — nothing is loop-invariant for XLA to hoist). Use for
    DEVICE-throughput measurement and for remote-dispatch-bound
    environments: a host loop of jitted steps pays per-dispatch latency
    (~8-12 ms over the axon tunnel — comparable to the step itself at
    batch 256), which clamps the measured rate; the scan removes the
    host from the loop entirely. train.py keeps the host loop (it needs
    per-step checkpoint/print hooks)."""
    base = make_train_step(model, tx, cfg, size_info, eval_mode)
    # reuse the jitted step's underlying function (same traced body);
    # jax.jit exposes it as __wrapped__
    step_fn = getattr(base, "__wrapped__", None)
    if step_fn is None:  # jax stopped exposing the wrapped fn
        raise RuntimeError(
            "make_train_scan needs jax.jit.__wrapped__; this jax "
            "version does not expose it — scan the step via a "
            "refactored raw step function instead")

    def run(state: TrainState, raw: RawBatch, rng: jax.Array,
            n: int):
        def body(s, _):
            s2, losses = step_fn(s, raw, rng)
            return s2, losses["total_loss"]

        state2, totals = jax.lax.scan(body, state, None, length=n)
        return state2, totals.sum()

    return jax.jit(run, static_argnums=(3,), donate_argnums=(0,))


def batch_indices(n: int, batch_size: int, rng: np.random.Generator):
    """Shuffled fixed-size epoch index stream: (B,) int32 per batch.

    Pads the final partial batch by wrapping around (static shapes for
    XLA) — the reference's DataLoader just emits a ragged final batch
    instead. The single permutation source shared by the host-gather
    iterator (batches_from_arrays) and the stage-once device-gather path
    (make_train_step(staged=True)), so both consume the identical batch
    sequence for a given rng."""
    order = rng.permutation(n)
    if n % batch_size:
        order = np.concatenate(
            [order, order[: batch_size - n % batch_size]])
    for start in range(0, len(order), batch_size):
        yield order[start: start + batch_size].astype(np.int32)


def stage_arrays(arrays: Dict[str, np.ndarray], sharding=None) -> RawBatch:
    """device_put the whole tensorized dataset ONCE (replicated by
    default, or with an explicit sharding) for the staged train step.
    Feed the result as a jit ARGUMENT every step — never close over it
    (the HTTP-413 remote-compile gotcha)."""
    put = (jax.device_put if sharding is None
           else lambda a: jax.device_put(a, sharding))
    return RawBatch(
        objs=put(arrays["objs"]), boxes=put(arrays["boxes"]),
        angles=put(arrays["angles"]), obj_mask=put(arrays["obj_mask"]),
        room_ids=put(arrays["room_ids"]))


def batches_from_arrays(arrays: Dict[str, np.ndarray], batch_size: int,
                        rng: np.random.Generator):
    """Shuffled fixed-size epoch iterator over tensorized scenes (host
    gather; see batch_indices for the shared permutation semantics)."""
    n = arrays["objs"].shape[0]
    for idx in batch_indices(n, batch_size, rng):
        yield RawBatch(
            objs=arrays["objs"][idx], boxes=arrays["boxes"][idx],
            angles=arrays["angles"][idx], obj_mask=arrays["obj_mask"][idx],
            room_ids=arrays["room_ids"][idx])


def host_sharded_batches(arrays: Dict[str, np.ndarray],
                         global_batch_size: int, rng: np.random.Generator,
                         process_index: Optional[int] = None,
                         process_count: Optional[int] = None):
    """Per-host disjoint shard of the exact global epoch stream — the
    multi-host replacement for the reference's 8-worker DataLoader
    (options/options.py:23; SURVEY §2.10 "host-sharded input pipeline").

    Every host seeds the SAME rng and therefore draws the SAME global
    permutation (a few integer ops — no data is duplicated), then slices
    rows [pi*B/H, (pi+1)*B/H) out of each global batch. Concatenating the
    H host streams in process order reproduces batches_from_arrays(...)
    bit for bit (tests/test_train.py), so multi-host training consumes
    the identical global batch sequence as single-host. Feed the local
    shard through parallel.mesh.global_from_host_shards to assemble the
    global device array (within a slice the step's collectives ride ICI;
    host shards only cross DCN at this input boundary).

    process_index/process_count default to jax.process_index()/count —
    pass them explicitly to simulate multiple hosts in one process."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if global_batch_size % process_count:
        raise ValueError(
            f"global batch {global_batch_size} is not divisible by "
            f"process count {process_count}")
    local = global_batch_size // process_count
    lo = process_index * local
    for raw in batches_from_arrays(arrays, global_batch_size, rng):
        yield RawBatch(*(a[lo:lo + local] for a in raw))
