"""SPADE discriminators + image encoder (training-side components).

Re-implements the reference's train-time GAN machinery
(models/SPADE_related.py): MultiscaleDiscriminator :397-447 /
NLayerDiscriminator :450-506 (pix2pixHD, intermediate features for the
feature-matching loss) and ConvEncoder :595-642 (image -> z posterior).
Spectral norm on discriminator convs is trained via power iteration
(sln_tpu.spade.spectral).
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sln_tpu.spade.spectral import SpectralConv
from sln_tpu.spade.layers import resize_bilinear


def avg_pool_down(x: jnp.ndarray) -> jnp.ndarray:
    """F.avg_pool2d(kernel=3, stride=2, padding=1, count_include_pad=False)
    (reference :430-433)."""
    ones = jnp.ones_like(x[..., :1])
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


class NLayerDiscriminator(nn.Module):
    """pix2pixHD discriminator (reference :450-506), spectral-instance norm.

    Returns the list of intermediate features; the last entry is the logit
    map — or, with mmd_nz > 0, the (logits, z) tuple of the MMD variant's
    decide/z_out heads (reference NLayerDiscriminator_MMD :1237-1296)."""
    ndf: int = 64
    n_layers: int = 3
    mmd_nz: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> List[jnp.ndarray]:
        results = []
        nf = self.ndf
        h = SpectralConv(nf, (4, 4), strides=2, padding=2,
                         name="conv0")(x, train)
        h = nn.leaky_relu(h, 0.2)
        results.append(h)
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers - 1 else 2
            h = SpectralConv(nf, (4, 4), strides=stride, padding=2,
                             name=f"conv{n}")(h, train)
            # instance norm (get_nonspade_norm_layer 'spectralinstance')
            mean = h.mean(axis=(1, 2), keepdims=True)
            var = h.var(axis=(1, 2), keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            h = nn.leaky_relu(h, 0.2)
            results.append(h)
        if self.mmd_nz > 0:
            logits = nn.Conv(1, (1, 1), name="decide")(h)
            z = nn.Conv(h.shape[-1], (1, 1), name="z_out0")(h)
            z = nn.leaky_relu(z, 0.01)
            z = nn.Conv(self.mmd_nz, (1, 1), name="z_out1")(z)
            results.append((logits, z.mean(axis=(1, 2))))
        else:
            logits = nn.Conv(1, (1, 1), padding=1, name="head")(h)
            results.append(logits)
        return results


class MultiscaleDiscriminator(nn.Module):
    """Reference :397-447: num_D discriminators on a downsampled pyramid,
    each one layer shallower than the previous. mmd_nz > 0 selects the
    MMD decide/z_out heads (reference MultiscaleDiscriminator_MMD_2)."""
    ndf: int = 64
    n_layers: int = 3
    num_d: int = 2
    mmd_nz: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> List[List[jnp.ndarray]]:
        outs = []
        n_layers = self.n_layers
        for i in range(self.num_d):
            outs.append(NLayerDiscriminator(
                ndf=self.ndf, n_layers=max(n_layers, 1),
                mmd_nz=self.mmd_nz,
                name=f"discriminator_{i}")(x, train))
            n_layers -= 1
            if i + 1 < self.num_d:
                x = avg_pool_down(x)
        return outs


class ConvEncoder(nn.Module):
    """Image -> (mu, logvar) of z (reference :595-642)."""
    nef: int = 64
    output_nc: int = 256
    crop_size: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if x.shape[1] != 256 or x.shape[2] != 256:
            x = resize_bilinear(x, 256, 256)
        nef = self.nef
        widths = [nef, nef * 2, nef * 4, nef * 8, nef * 8]
        for i, w in enumerate(widths):
            x = SpectralConv(w, (3, 3), strides=2, padding=1,
                             name=f"layer{i + 1}")(x, train)
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            if i < len(widths) - 1 or self.crop_size >= 256:
                x = nn.leaky_relu(x, 0.2)
        if self.crop_size >= 256:
            x = SpectralConv(nef * 8, (3, 3), strides=2, padding=1,
                             name="layer6")(x, train)
        x = x.mean(axis=(1, 2))                       # adaptive avg pool 1x1
        x = nn.leaky_relu(x, 0.2)
        mu = nn.Dense(self.output_nc, name="fc_mu")(x)
        logvar = nn.Dense(self.output_nc, name="fc_var")(x)
        return mu, logvar
