"""Classic SPADE modules (reference SPADEGenerator / SPADE /
SPADEResnetBlock, models/SPADE_related.py:151-346).

The production inference path uses SPADEGenerator4 (sln_tpu.spade.generator);
these are the canonical SPADE variants for standard segmentation-map
conditioning (no depth branch, instance/batch param-free norm, plain
residual blocks). The experimental variants 2/3/5 live in
sln_tpu.spade.variants.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sln_tpu.spade.layers import (PadConv, SEBlock2, resize_bilinear,
                                  resize_nearest)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Param-free instance norm over (H, W) per sample/channel."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class SPADE(nn.Module):
    """Reference SPADE :302-346 ('instance' param-free norm)."""
    norm_nc: int
    label_nc: int
    ks: int = 3
    nhidden: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray) -> jnp.ndarray:
        normalized = instance_norm(x)
        seg = resize_bilinear(segmap, x.shape[1], x.shape[2])
        pw = self.ks // 2
        actv = nn.Conv(self.nhidden, (self.ks, self.ks), padding=pw,
                       name="mlp_shared")(seg)
        actv = nn.relu(actv)
        gamma = nn.Conv(self.norm_nc, (self.ks, self.ks), padding=pw,
                        name="mlp_gamma")(actv)
        beta = nn.Conv(self.norm_nc, (self.ks, self.ks), padding=pw,
                       name="mlp_beta")(actv)
        return normalized * (1.0 + gamma) + beta


class SPADEResnetBlock(nn.Module):
    """Reference :252-300 (spectral norm folded / omitted)."""
    fin: int
    fout: int
    label_nc: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        fmiddle = min(self.fin, self.fout)
        if self.fin != self.fout:
            x_s = nn.Conv(self.fout, (1, 1), use_bias=False,
                          name="conv_s")(
                SPADE(self.fin, self.label_nc, name="norm_s")(x, seg))
        else:
            x_s = x
        dx = SPADE(self.fin, self.label_nc, name="norm_0")(x, seg)
        dx = nn.Conv(fmiddle, (3, 3), padding=1, name="conv_0")(
            nn.leaky_relu(dx, 0.2))
        dx = SPADE(fmiddle, self.label_nc, name="norm_1")(dx, seg)
        dx = nn.Conv(self.fout, (3, 3), padding=1, name="conv_1")(
            nn.leaky_relu(dx, 0.2))
        return x_s + dx


class SEResBlock2(nn.Module):
    """Reference :87-101: two 3x3 convs (instance norm) + SE, residual."""
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = PadConv(self.dim, 3, 1, name="conv0")(x)
        h = instance_norm(h)
        h = nn.relu(h)
        h = PadConv(self.dim, 3, 1, name="conv1")(h)
        h = instance_norm(h)
        h = SEBlock2(self.dim, reduction=4, name="se")(h)
        return x + h


class SPADEGenerator(nn.Module):
    """Reference SPADEGenerator :151-250 (z -> fc -> SPADE res blocks ->
    tanh RGB), nearest 2x upsampling throughout."""
    semantic_nc: int = 41
    target_nc: int = 3
    nz: int = 256
    ngf: int = 64
    crop_size: int = 256
    n_up: str = "normal"

    @nn.compact
    def __call__(self, seg: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        nf = self.ngf
        num_up = {"normal": 5, "more": 6, "most": 7}[self.n_up]
        sw = self.crop_size // (2 ** num_up)
        L = self.semantic_nc

        x = nn.Dense(16 * nf * sw * sw, name="fc")(z)
        x = x.reshape(-1, 16 * nf, sw, sw).transpose(0, 2, 3, 1)

        def up(t):
            return resize_nearest(t, t.shape[1] * 2, t.shape[2] * 2)

        seg_1 = resize_nearest(seg, sw, sw)
        x = SPADEResnetBlock(16 * nf, 16 * nf, L, name="head_0")(x, seg_1)
        x = up(x)
        x = SPADEResnetBlock(16 * nf, 16 * nf, L, name="G_middle_0")(x, seg)
        if self.n_up in ("more", "most"):
            x = up(x)
        x = SPADEResnetBlock(16 * nf, 16 * nf, L, name="G_middle_1")(x, seg)
        x = up(x)
        x = SPADEResnetBlock(16 * nf, 8 * nf, L, name="up_0")(x, seg)
        x = up(x)
        x = SPADEResnetBlock(8 * nf, 4 * nf, L, name="up_1")(x, seg)
        x = up(x)
        x = SPADEResnetBlock(4 * nf, 2 * nf, L, name="up_2")(x, seg)
        x = up(x)
        x = SPADEResnetBlock(2 * nf, 1 * nf, L, name="up_3")(x, seg)
        final_nc = nf
        if self.n_up == "most":
            x = up(x)
            x = SPADEResnetBlock(1 * nf, nf // 2, L, name="up_4")(x, seg)
            final_nc = nf // 2
        x = SEResBlock2(final_nc, name="conv_img_pre")(x)
        x = nn.Conv(self.target_nc, (5, 5), padding=2, name="conv_img")(
            nn.leaky_relu(x, 0.2))
        return jnp.tanh(x)
