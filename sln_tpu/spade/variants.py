"""Experimental SPADE variants 2/3/5 (reference models/SPADE_related.py
:644-760 / :981-1182 / :1607-1803).

These are dead code in the reference (only SPADEGenerator4 is loaded at
inference, testing/test_SPADE_shade.py:9) but are replicated for full
component parity. What each variant changes vs the classic SPADE:

* SPADE2 (:796-845): the depth channel gets its own ks-kernel conv branch
  (-> nhidden/8 ch) and the 40 labels a 1x1 conv branch (-> nhidden/2),
  concatenated into a 1x1 shared conv; zero padding throughout.
* SPADE3 (:981-1032): same two-branch split but reflection padding, leaky
  activations on both branches, and a 3x3 shared conv.
* SPADE5 (:1607-1656): depth -> ks conv -> tanh gate MULTIPLIED into the
  labels; concat(gated, labels) (80 ch) -> 3x3 shared conv; supports the
  'layer' param-free norm.
* SPADEResnetBlock2/3/5 (:746-794, :1034-1083, :1658-1703): the matching
  residual blocks — 3 adds an SE block on the residual branch (reduction
  8); 2 uses zero-padded convs; 3/5 reflection-padded convs.
* SPADEGenerator2/3/5 (:644-744, :1084-1182, :1705-1803): 2 starts from a
  12nf seed and inserts an SEResBlock2 before the RGB conv; 3 is the
  16nf skeleton with a 5x5 RGB head; 5 uses a bilinear upsample before
  up_3 (like generator 4) and a 3x3 RGB head.

Torch's spectral_norm is an inference-time constant kernel rescale;
like SPADEResnetBlock4 (layers.py) these use plain convs with spectral
scaling folded at port time.

Quirk NOT replicated: generator 5's 'more'/'most' branches reference a
nonexistent `self.up` in the reference (:1789,:1798 AttributeError);
n_up != 'normal' raises ValueError here instead.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sln_tpu.spade.classic import SEResBlock2, instance_norm
from sln_tpu.spade.layers import (PadConv, SEBlock2, layer_norm_2d,
                                  resize_bilinear, resize_nearest)


def batch_norm_2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Param-free batch norm (training-mode statistics over B, H, W)."""
    mean = x.mean(axis=(0, 1, 2), keepdims=True)
    var = x.var(axis=(0, 1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def param_free_norm(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "instance":
        return instance_norm(x)
    if kind == "batch":
        return batch_norm_2d(x)
    if kind == "layer":
        return layer_norm_2d(x)
    raise ValueError(f"unknown param-free norm {kind!r}")


class SPADE2(nn.Module):
    """Reference SPADE2 :796-845."""
    norm_nc: int
    label_nc: int = 41
    ks: int = 3
    nhidden: int = 128
    param_free: str = "instance"

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
        normalized = param_free_norm(x, self.param_free)
        seg = resize_bilinear(segmap, x.shape[1], x.shape[2])
        pw = self.ks // 2
        depth = nn.Conv(self.nhidden // 8, (self.ks, self.ks), padding=pw,
                        name="mlp_preshared_depth")(seg[..., 0:1])
        label = nn.Conv(self.nhidden // 2, (1, 1), padding="VALID",
                        name="mlp_preshared_label")(seg[..., 1:])
        actv = nn.Conv(self.nhidden, (1, 1), padding="VALID",
                       name="mlp_shared")(
            jnp.concatenate([depth, label], axis=-1))
        actv = nn.relu(actv)
        gamma = nn.Conv(self.norm_nc, (self.ks, self.ks), padding=pw,
                        name="mlp_gamma")(actv)
        beta = nn.Conv(self.norm_nc, (self.ks, self.ks), padding=pw,
                       name="mlp_beta")(actv)
        return normalized * (1.0 + gamma) + beta


class SPADE3(nn.Module):
    """Reference SPADE3 :981-1032 (reflection pads, leaky branches)."""
    norm_nc: int
    label_nc: int = 41
    ks: int = 3
    nhidden: int = 128
    param_free: str = "instance"

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
        normalized = param_free_norm(x, self.param_free)
        seg = resize_bilinear(segmap, x.shape[1], x.shape[2])
        pw = self.ks // 2
        depth = PadConv(self.nhidden // 8, self.ks, pw,
                        name="mlp_preshared_depth")(seg[..., 0:1])
        depth = nn.leaky_relu(depth, 0.01)
        label = nn.Conv(self.nhidden // 2, (1, 1), padding="VALID",
                        name="mlp_preshared_label")(seg[..., 1:])
        label = nn.leaky_relu(label, 0.01)
        actv = PadConv(self.nhidden, 3, pw, name="mlp_shared")(
            jnp.concatenate([depth, label], axis=-1))
        actv = nn.relu(actv)
        gamma = PadConv(self.norm_nc, self.ks, pw, name="mlp_gamma")(actv)
        beta = PadConv(self.norm_nc, self.ks, pw, name="mlp_beta")(actv)
        return normalized * (1.0 + gamma) + beta


class SPADE5(nn.Module):
    """Reference SPADE5 :1607-1656: tanh depth gate multiplied into the
    labels before the shared conv; supports the 'layer' norm."""
    norm_nc: int
    label_nc: int = 41
    ks: int = 3
    nhidden: int = 128
    param_free: str = "layer"

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
        normalized = param_free_norm(x, self.param_free)
        seg = resize_bilinear(segmap, x.shape[1], x.shape[2])
        pw = self.ks // 2
        labels = seg[..., 1:]                           # (.., 40)
        depth = PadConv(40, self.ks, pw,
                        name="mlp_preshared_depth")(seg[..., 0:1])
        gated = jnp.tanh(depth) * labels
        actv = PadConv(self.nhidden, 3, pw, name="mlp_shared")(
            jnp.concatenate([gated, labels], axis=-1))
        actv = nn.leaky_relu(actv, 0.01)
        gamma = PadConv(self.norm_nc, self.ks, pw, name="mlp_gamma")(actv)
        beta = PadConv(self.norm_nc, self.ks, pw, name="mlp_beta")(actv)
        return normalized * (1.0 + gamma) + beta


def _norm_cls(variant: int):
    return {2: SPADE2, 3: SPADE3, 5: SPADE5}[variant]


class SPADEResnetBlockV(nn.Module):
    """SPADEResnetBlock2/3/5 (reference :746-794, :1034-1083,
    :1658-1703), selected by `variant`. Variant 3 adds SE(reduction=8)
    on the residual branch; 2 uses zero-padded convs, 3/5 reflection."""
    fin: int
    fout: int
    variant: int
    label_nc: int = 41
    param_free: str = "instance"

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        fmiddle = min(self.fin, self.fout)
        Norm = _norm_cls(self.variant)

        def conv(features, name):
            if self.variant == 2:
                return nn.Conv(features, (3, 3), padding=1, name=name)
            return PadConv(features, 3, 1, name=name)

        kw = dict(label_nc=self.label_nc, param_free=self.param_free)
        if self.fin != self.fout:
            x_s = nn.Conv(self.fout, (1, 1), padding="VALID",
                          use_bias=False, name="conv_s")(
                Norm(self.fin, name="norm_s", **kw)(x, seg))
        else:
            x_s = x
        dx = Norm(self.fin, name="norm_0", **kw)(x, seg)
        dx = conv(fmiddle, "conv_0")(nn.leaky_relu(dx, 0.2))
        dx = Norm(fmiddle, name="norm_1", **kw)(dx, seg)
        dx = conv(self.fout, "conv_1")(nn.leaky_relu(dx, 0.2))
        if self.variant == 3:
            dx = SEBlock2(self.fout, reduction=8, name="se")(dx)
        return x_s + dx


class SPADEGeneratorV(nn.Module):
    """SPADEGenerator2/3/5 (reference :644-744, :1084-1182, :1705-1803),
    selected by `variant`. Differences from the shared skeleton:
    variant 2 seeds 12nf and runs an SEResBlock2 before a 5x5 RGB head;
    variant 3 seeds 16nf with a 5x5 head; variant 5 seeds 16nf, uses a
    bilinear upsample before up_3, and a 3x3 head."""
    variant: int
    semantic_nc: int = 41
    target_nc: int = 3
    nz: int = 256
    ngf: int = 64
    crop_size: int = 256
    n_up: str = "normal"
    param_free: str = "instance"

    @nn.compact
    def __call__(self, seg: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        nf = self.ngf
        base = 12 if self.variant == 2 else 16
        if self.variant == 5 and self.n_up != "normal":
            # reference generator 5 crashes on 'more'/'most' (missing
            # self.up at :1789,:1798)
            raise ValueError("SPADEGenerator5 supports n_up='normal' only")
        num_up = {"normal": 5, "more": 6, "most": 7}[self.n_up]
        sw = self.crop_size // (2 ** num_up)
        L = self.semantic_nc

        def block(fin, fout, name):
            return SPADEResnetBlockV(fin, fout, self.variant, L,
                                     self.param_free, name=name)

        x = nn.Dense(base * nf * sw * sw, name="fc")(z)
        x = x.reshape(-1, base * nf, sw, sw).transpose(0, 2, 3, 1)

        def up_n(t):
            return resize_nearest(t, t.shape[1] * 2, t.shape[2] * 2)

        def up_b(t):
            return resize_bilinear(t, t.shape[1] * 2, t.shape[2] * 2)

        seg_1 = resize_nearest(seg, sw, sw)
        x = block(base * nf, base * nf, "head_0")(x, seg_1)
        x = up_n(x)
        x = block(base * nf, base * nf, "G_middle_0")(x, seg)
        if self.n_up in ("more", "most"):
            x = up_n(x)
        x = block(base * nf, base * nf, "G_middle_1")(x, seg)
        x = up_n(x)
        x = block(base * nf, 8 * nf, "up_0")(x, seg)
        x = up_n(x)
        x = block(8 * nf, 4 * nf, "up_1")(x, seg)
        x = up_n(x)
        x = block(4 * nf, 2 * nf, "up_2")(x, seg)
        x = up_b(x) if self.variant == 5 else up_n(x)
        x = block(2 * nf, 1 * nf, "up_3")(x, seg)
        final_nc = nf
        if self.n_up == "most":
            x = up_n(x)
            x = block(1 * nf, nf // 2, "up_4")(x, seg)
            final_nc = nf // 2
        if self.variant == 2:
            x = SEResBlock2(final_nc, name="conv_img_pre")(x)
        k = 3 if self.variant == 5 else 5
        x = nn.Conv(self.target_nc, (k, k), padding=k // 2,
                    name="conv_img")(nn.leaky_relu(x, 0.2))
        return jnp.tanh(x)


def SPADEGenerator2(**kw):
    return SPADEGeneratorV(variant=2, **kw)


def SPADEGenerator3(**kw):
    return SPADEGeneratorV(variant=3, **kw)


def SPADEGenerator5(**kw):
    return SPADEGeneratorV(variant=5, **kw)
