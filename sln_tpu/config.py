"""Typed configuration for the whole framework.

Replaces the reference's single global argparse namespace
(reference: options/options.py:9-86) and centralizes the constants the
reference scatters across files (24 angle bins at Sg2ScVAE_model.py:10,
NYU-40 class list repeated in diff_render.py:3 / test_render_refine.py:32 /
test_SPADE_shade.py:32-36 / test_plot2d.py:16-20, camera constants at
diff_render.py:14-17).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModelConfig:
    """Sg2ScVAE hyperparameters (reference defaults: options/options.py:24-29,
    build_dataset_model.py:39-53, Sg2ScVAE_model.py:7-23)."""

    embedding_dim: int = 64
    gconv_num_layers: int = 5
    gconv_mode: str = "feedforward"          # 'feedforward' | 'recurrent'
    gconv_pooling: str = "avg"
    mlp_normalization: str = "batch"          # 'batch' | 'none'
    decoder_cat: bool = True                   # options/options.py:55
    use_attr: bool = True
    use_ae: bool = False                       # options/options.py:54
    train_3d: bool = True
    num_angles: int = 24                       # Sg2ScVAE_model.py:10
    # MLP/gconv compute dtype ("float32" | "bfloat16"); params and all
    # model outputs stay fp32 either way (checkpoints/losses unchanged).
    # Measured at the default model size: eval acc/L1 identical, sampler
    # throughput unchanged (its small matmuls already run as single bf16
    # MXU passes), so fp32 stays the default; the knob matters when the
    # model is scaled up and activation traffic starts to dominate.
    # CLI: train.py/test.py --compute_dtype.
    compute_dtype: str = "float32"

    # Vocabulary sizes (see sln_tpu.data.vocab). Stored here so the model is
    # self-describing without a vocab object.
    num_objs: int = 32
    num_preds: int = 16
    num_attrs: int = 5

    @property
    def gconv_dim(self) -> int:
        return self.embedding_dim

    @property
    def gconv_hidden_dim(self) -> int:
        # Hardcoded 4x in the reference (Sg2ScVAE_model.py:19-20); the
        # declared --gconv_hidden_dim flag is dead there.
        return self.embedding_dim * 4

    @property
    def box_embedding_dim(self) -> int:
        return int(self.embedding_dim * 3 / 4)

    @property
    def angle_embedding_dim(self) -> int:
        return int(self.embedding_dim / 4)

    @property
    def obj_embedding_dim(self) -> int:
        return (int(self.embedding_dim * 3 / 4)
                if self.use_attr else self.embedding_dim)

    @property
    def attr_embedding_dim(self) -> int:
        return int(self.embedding_dim / 4) if self.use_attr else 0

    @property
    def box_dim(self) -> int:
        return 6 if self.train_3d else 4

    @property
    def latent_dim(self) -> int:
        # z = [z_box (48), z_angle (16)] at embedding_dim=64
        return self.box_embedding_dim + self.angle_embedding_dim


# ---------------------------------------------------------------------------
# Data / batching
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DataConfig:
    """Static-shape padded scene-graph batching.

    The reference flattens ragged scenes into one variable-size graph per
    batch (data/suncg_dataset.py:295-337). XLA needs static shapes, so each
    scene is padded to `max_objects` object slots (the last real slot is the
    __room__ node) and `max_triples` triple slots, with boolean masks.
    """

    max_objects: int = 32      # per scene, includes the __room__ node
    max_triples: int = 96      # >= max_on_rels + 2*max_objects
    max_on_rels: int = 32      # cap on 'on' relations packed per scene
    use_attr_30: bool = True   # options/options.py:58
    touching_relations: bool = True

    train_path: str = "metadata/data_rot_train.json"
    val_path: str = "metadata/data_rot_val.json"


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainConfig:
    """Reference defaults: options/options.py:34-59, train.py:73-76."""

    batch_size: int = 128
    num_iterations: int = 600_000
    learning_rate: float = 1e-4
    kl_loss_weight: float = 0.1
    kl_linear_decay: bool = False   # staircase 10**(t//1e5 - 6) when True
    # Free-bits floor per latent dim (0 = off, exact reference parity).
    # Long training collapses the posterior KL on graph-determined data,
    # which kills z-space refinement (see CLAUDE.md modeling notes); a
    # small floor (e.g. 0.05) keeps z informative.
    kl_free_bits: float = 0.0
    seed: int = 42
    # Gradient accumulation: split each step's batch into microbatch-sized
    # chunks run through one lax.scan (0 = off). Chunk gradients are
    # weighted by their valid-object counts (exact loss normalization
    # across unequal chunks); the usual accumulation semantics apply —
    # train-mode BN normalizes per chunk, free-bits floors per chunk
    # (loop.py make_train_step docstring). fwd/bwd runs at the chunk
    # shape, which keeps large per-chip batches at the <=256
    # fused-pipeline sweet spot (see CLAUDE.md perf notes).
    microbatch: int = 0
    print_every: int = 100
    checkpoint_every: int = 1000
    snapshot_every: int = 10_000
    eval_mode_after: int = -1
    output_dir: str = "./checkpoints"
    checkpoint_name: str = "latest_checkpoint"
    # TPU-specific
    data_axis: str = "data"
    model_axis: str = "model"


# ---------------------------------------------------------------------------
# Rendering / refinement
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CameraConfig:
    """Projection camera (reference: models/diff_render.py:13-46)."""

    focal_pix: float = 400.0          # at a 1024-wide sensor
    sensor_size: int = 1024
    inter_size: int = 512             # `inter_out`, diff_render.py:4
    image_size: int = 256             # `final_out`, diff_render.py:5
    pitch: float = -0.4               # theta_rot, diff_render.py:15
    height_offset_cap: float = 0.1    # diff_render.py:26
    near: float = 0.001
    depth_clip: float = 15.0          # diff_render.py:367
    cull_eps: float = 0.06            # diff_render.py:347


@dataclass(frozen=True)
class RenderConfig:
    camera: CameraConfig = field(default_factory=CameraConfig)
    max_vertices: int = 4096          # padded per-scene vertex buffer
    max_faces: int = 8192             # padded per-scene face buffer
    sigma_px: float = 0.5             # soft edge band width (pixels)
    gamma: float = 0.02               # visibility softmax temperature (m)
    z_far: float = 100.0              # background depth
    num_classes: int = 41             # 1 empty + 40 NYU classes
    mesh_subdiv: int = 2              # procedural bank subdivision
    shell_subdiv: int = 4             # room-shell subdivision
    backend: str = "auto"             # 'auto' | 'pallas' | 'jax'


@dataclass(frozen=True)
class RefineConfig:
    """Latent-optimization refinement (reference: testing/test_render_refine.py)."""

    num_iters: int = 60               # Niter_train, test_render_refine.py:269
    lr_z: float = 2e-4                # :286
    lr_model_scale: float = 0.1       # model params at lr/10
    momentum: float = 0.1
    nesterov: bool = True
    seed: int = 13                    # :274-275
    softargmax_beta: float = 2.0      # :20
    angle_noise_scale: float = 0.1    # :293
    pyramid_sizes: Tuple[int, ...] = (32, 48, 64, 96)   # PSP_pool_new :193
    depth_loss_weight: float = 100.0 * 0.5              # :350-352
    semantic_loss_weight: float = 100.0 / 800.0         # :349-352
    size_loss_weight: float = 2.0                        # :354
    # TPU-first: the PSP loss pyramid tops out at 96x96, so refinement
    # renders at 96px by default (7x fewer pixels than the reference's
    # 256 with no loss-relevant information lost); set 256 for strict
    # reference parity.
    render_size: int = 96


# ---------------------------------------------------------------------------
# SPADE
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SpadeConfig:
    """SPADEGenerator4 as loaded at inference (testing/test_SPADE_shade.py:9)."""

    semantic_nc: int = 41
    target_nc: int = 3
    nz: int = 256
    ngf: int = 64
    norm: str = "spectralspadelayer3x3"
    crop_size: int = 256
    n_up: str = "normal"
    num_z: int = 50                   # test.py:94
    # conv compute dtype for inference shading ("float32" | "bfloat16").
    # make_spade_model STORES the serving weights in bf16 too —
    # bit-identical output (flax casts fp32 params to the module dtype
    # per call anyway) with half the weight HBM traffic. Measured v5e
    # effect (r4, honest scan+fetch, tools/profile_spade_factored.py):
    # +13-14% imgs/s (decode 225 vs 200; cold-seg full forward 112 vs 97)
    # at ~1.5/255 mean image error — the generator's activation traffic,
    # not its weights, dominates HBM at 256px, so bf16 weights buy much
    # less than the 2x a weight-bound roofline would predict. fp32 stays
    # the default (quality over the modest win).
    compute_dtype: str = "float32"


# ---------------------------------------------------------------------------
# Top-level
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    refine: RefineConfig = field(default_factory=RefineConfig)
    spade: SpadeConfig = field(default_factory=SpadeConfig)
    test_dir: str = "./layouts_out"

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


def default_config() -> Config:
    return Config()
