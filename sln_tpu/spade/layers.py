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
    """Depth-aware SPADE modulation (reference :1404-1454), 'layer' norm."""
    norm_nc: int
    label_nc: int = 41
    ks: int = 3
    nhidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, norm_nc); segmap: (B, Hs, Ws, label_nc) with the
        depth map in channel 0."""
        normalized = layer_norm_2d(x)

        seg = resize_bilinear(segmap, x.shape[1], x.shape[2])
        pw = self.ks // 2
        depth = PadConv(self.nhidden // 8, self.ks, pw, dtype=self.dtype,
                        name="mlp_preshared_depth")(seg[..., 0:1])
        depth = nn.leaky_relu(depth, 0.01)
        actv = PadConv(self.nhidden, 3, pw, dtype=self.dtype,
                       name="mlp_shared")(
            jnp.concatenate([depth, seg[..., 1:].astype(depth.dtype)],
                            axis=-1))
        actv = nn.relu(actv)
        gamma = PadConv(self.norm_nc, self.ks, pw, dtype=self.dtype,
                        name="mlp_gamma")(actv)
        beta = PadConv(self.norm_nc, self.ks, pw, dtype=self.dtype,
                       name="mlp_beta")(actv)
        return normalized * (1.0 + gamma) + beta


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
    """Reference :1457-1505 (spectral norm folded into kernels)."""
    fin: int
    fout: int
    label_nc: int = 41
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout

        if learned_shortcut:
            x_s = nn.Conv(self.fout, (1, 1), padding="VALID",
                          use_bias=False, dtype=self.dtype, name="conv_s")(
                SPADE4(self.fin, self.label_nc, dtype=self.dtype,
                       name="norm_s")(x, seg))
        else:
            x_s = x

        dx = SPADE4(self.fin, self.label_nc, dtype=self.dtype,
                    name="norm_0")(x, seg)
        dx = PadConv(fmiddle, 3, 1, dtype=self.dtype, name="conv_0")(
            nn.leaky_relu(dx, 0.2))
        dx = SPADE4(fmiddle, self.label_nc, dtype=self.dtype,
                    name="norm_1")(dx, seg)
        dx = PadConv(self.fout, 3, 1, dtype=self.dtype, name="conv_1")(
            nn.leaky_relu(dx, 0.2))
        dx = SEBlock2(self.fout, name="se")(dx)
        return (x_s + dx).astype(x.dtype)
