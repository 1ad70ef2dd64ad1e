"""SPADE building blocks in flax (NHWC), fused-XLA-conv implementations.

Re-implements the blocks of reference models/SPADE_related.py used by the
production generator (SPADEGenerator4, loaded at testing/test_SPADE_shade.py:9):

* LayerNorm2D (reference :128-149) — per-sample whole-tensor norm with
  torch's *unbiased* std and (std + eps) in the denominator;
* SPADE4 modulation (reference :1404-1454) — depth channel gets its own
  conv branch, concatenated with the 40 label channels;
* SEBlock2 (reference :70-85);
* SPADEResnetBlock4 (reference :1457-1505).

Spectral norm: at inference torch's spectral_norm is a constant rescale of
the kernel; ported checkpoints arrive pre-folded (utils in
sln_tpu.spade.port). For training from scratch, `SpectralDense`/power
iteration lives in sln_tpu.spade.spectral.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """NHWC reflection padding (torch nn.ReflectionPad2d)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")


class PadConv(nn.Module):
    """ReflectionPad2d(p) + Conv2d(k, padding=0).

    `dtype` is the conv COMPUTE dtype (params stay fp32): bfloat16 runs
    the MXU at full rate instead of the 3-pass fp32 decomposition."""
    features: int
    kernel: int
    pad: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = reflect_pad(x, self.pad)
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       padding="VALID", use_bias=self.use_bias,
                       dtype=self.dtype, name="conv")(x)


def layer_norm_2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Reference LayerNorm2D without affine (:139-144): per-sample mean/std
    over ALL of (H, W, C), unbiased std, divide by (std + eps)."""
    B = x.shape[0]
    flat = x.reshape(B, -1).astype(jnp.float32)
    mean = flat.mean(axis=1)
    n = flat.shape[1]
    var = flat.var(axis=1) * (n / max(n - 1, 1))        # unbiased
    # clamp inside the sqrt: constant inputs (var == 0) would make the
    # backward pass inf/NaN
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    shape = (B, 1, 1, 1)
    return ((x - mean.reshape(shape))
            / (std.reshape(shape) + eps)).astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """NHWC bilinear resize matching torch F.interpolate(
    align_corners=False): half-pixel centers, NO antialiasing (jax's
    default antialias=True diverges from torch on downsampling)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]),
                            method="bilinear", antialias=False)


def resize_nearest(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """NHWC nearest resize with torch's asymmetric index rule
    src = floor(dst * in/out) (jax's half-pixel nearest differs when
    downsampling)."""
    H, W = x.shape[1], x.shape[2]
    rows = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


class SPADE4(nn.Module):
    """Depth-aware SPADE modulation (reference :1404-1454), 'layer' norm.

    Factored into `mods` (everything computable from the segmentation map
    alone: resize + depth branch + shared conv + gamma/beta convs) and
    `apply_mods` (the z-stream side). In the gan_shade serving workload
    (testing/test_SPADE_shade.py:74-80) seg is FIXED per room while 50 z
    vary, so `mods` runs once per room and `apply_mods` per z — see
    SPADEGenerator4.seg_mods/decode. `__call__(x, seg)` composes the two
    and is numerically identical to the unfactored block."""
    norm_nc: int
    label_nc: int = 41
    ks: int = 3
    nhidden: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        pw = self.ks // 2
        self.mlp_preshared_depth = PadConv(self.nhidden // 8, self.ks, pw,
                                           dtype=self.dtype)
        self.mlp_shared = PadConv(self.nhidden, 3, pw, dtype=self.dtype)
        self.mlp_gamma = PadConv(self.norm_nc, self.ks, pw,
                                 dtype=self.dtype)
        self.mlp_beta = PadConv(self.norm_nc, self.ks, pw, dtype=self.dtype)

    def mods(self, segmap: jnp.ndarray, h: int,
             w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """segmap: (B, Hs, Ws, label_nc), depth in channel 0 -> the
        (gamma, beta) modulation maps at (h, w)."""
        seg = resize_bilinear(segmap, h, w)
        depth = self.mlp_preshared_depth(seg[..., 0:1])
        depth = nn.leaky_relu(depth, 0.01)
        actv = self.mlp_shared(
            jnp.concatenate([depth, seg[..., 1:].astype(depth.dtype)],
                            axis=-1))
        actv = nn.relu(actv)
        return self.mlp_gamma(actv), self.mlp_beta(actv)

    @staticmethod
    def apply_mods(x: jnp.ndarray, gamma: jnp.ndarray,
                   beta: jnp.ndarray) -> jnp.ndarray:
        """Modulate the z stream; gamma/beta broadcast over x's batch."""
        return layer_norm_2d(x) * (1.0 + gamma) + beta

    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, norm_nc); segmap: (B, Hs, Ws, label_nc) with the
        depth map in channel 0."""
        gamma, beta = self.mods(segmap, x.shape[1], x.shape[2])
        return self.apply_mods(x, gamma, beta)


class SEBlock2(nn.Module):
    """Squeeze-excitation (reference :70-85)."""
    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x.mean(axis=(1, 2))                              # (B, C)
        y = nn.Dense(max(self.channels // self.reduction, 1),
                     use_bias=False, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        # cast the (B, C) gate, not the (B, H, W, C) stream: keeps the
        # multiply in the stream dtype (no fp32 round-trip under bf16)
        return x * y[:, None, None, :].astype(x.dtype)


class SPADEResnetBlock4(nn.Module):
    """Reference :1457-1505 (spectral norm folded into kernels).

    `mods`/`from_mods` split the block into its seg-only precompute (the
    per-SPADE gamma/beta stacks) and the z-stream pass, for fixed-seg
    serving (SPADE4 docstring); `__call__` composes them."""
    fin: int
    fout: int
    label_nc: int = 41
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        fmiddle = min(self.fin, self.fout)
        if self.fin != self.fout:
            self.norm_s = SPADE4(self.fin, self.label_nc, dtype=self.dtype)
            self.conv_s = nn.Conv(self.fout, (1, 1), padding="VALID",
                                  use_bias=False, dtype=self.dtype)
        self.norm_0 = SPADE4(self.fin, self.label_nc, dtype=self.dtype)
        self.conv_0 = PadConv(fmiddle, 3, 1, dtype=self.dtype)
        self.norm_1 = SPADE4(fmiddle, self.label_nc, dtype=self.dtype)
        self.conv_1 = PadConv(self.fout, 3, 1, dtype=self.dtype)
        self.se = SEBlock2(self.fout)

    def mods(self, seg: jnp.ndarray, h: int, w: int):
        """All (gamma, beta) pairs this block needs at resolution (h, w).
        PadConv preserves H/W, so norm_0/norm_1 (and the shortcut's
        norm_s) all modulate at the block's input resolution."""
        out = {"norm_0": self.norm_0.mods(seg, h, w),
               "norm_1": self.norm_1.mods(seg, h, w)}
        if self.fin != self.fout:
            out["norm_s"] = self.norm_s.mods(seg, h, w)
        return out

    def from_mods(self, x: jnp.ndarray, mods) -> jnp.ndarray:
        if self.fin != self.fout:
            x_s = self.conv_s(SPADE4.apply_mods(x, *mods["norm_s"]))
        else:
            x_s = x
        dx = SPADE4.apply_mods(x, *mods["norm_0"])
        dx = self.conv_0(nn.leaky_relu(dx, 0.2))
        dx = SPADE4.apply_mods(dx, *mods["norm_1"])
        dx = self.conv_1(nn.leaky_relu(dx, 0.2))
        dx = self.se(dx)
        return (x_s + dx).astype(x.dtype)

    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        return self.from_mods(x, self.mods(seg, x.shape[1], x.shape[2]))
