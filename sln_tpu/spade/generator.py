"""SPADEGenerator4 — the production shading generator.

Reference models/SPADE_related.py:1507-1605, instantiated at inference as
SPADEGenerator4(semantic_nc=41, target_nc=3, nz=256, ngf=64,
norm='spectralspadelayer3x3', crop_size=256, n_up='normal')
(testing/test_SPADE_shade.py:9). z(256) -> fc -> 16nf x 8 x 8, seven
SPADE-modulated residual blocks with nearest upsampling (bilinear before
up_3), 5x5 RGB head, tanh.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sln_tpu.spade.layers import (SPADEResnetBlock4, resize_bilinear,
                                  resize_nearest)


class SPADEGenerator4(nn.Module):
    semantic_nc: int = 41
    target_nc: int = 3
    nz: int = 256
    ngf: int = 64
    crop_size: int = 256
    n_up: str = "normal"
    # conv compute dtype; params stay fp32. bfloat16 runs the MXU at full
    # rate (the fp32 path decomposes each conv into 3 bf16 passes on TPU)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seg: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        """seg: (B, H, W, 41) NHWC (depth in channel 0); z: (B, 256).
        Returns (B, 256, 256, 3) fp32 in [-1, 1]."""
        nf = self.ngf
        num_up = {"normal": 5, "more": 6, "most": 7}[self.n_up]
        sw = self.crop_size // (2 ** num_up)

        # dtype plumbed so bf16 mode is uniform end-to-end: serving can
        # then store the (large, 256 x 16nf*sw^2) fc weights in bf16 with
        # bit-identical output (make_spade_model)
        x = nn.Dense(16 * nf * sw * sw, dtype=self.dtype, name="fc")(z)
        # torch reshapes NCHW: (B, 16nf, sh, sw) -> NHWC transpose
        x = x.reshape(-1, 16 * nf, sw, sw).transpose(0, 2, 3, 1)
        x = x.astype(self.dtype)                 # residual stream dtype

        def blk(fin, fout, name):
            return SPADEResnetBlock4(fin, fout, dtype=self.dtype,
                                     name=name)

        # F.interpolate default mode is NEAREST here (reference :1579)
        seg_1 = resize_nearest(seg, sw, sw)
        x = blk(16 * nf, 16 * nf, "head_0")(x, seg_1)

        def up_n(t):
            return resize_nearest(t, t.shape[1] * 2, t.shape[2] * 2)

        def up_b(t):
            return resize_bilinear(t, t.shape[1] * 2, t.shape[2] * 2)

        x = up_n(x)
        x = blk(16 * nf, 16 * nf, "G_middle_0")(x, seg)
        x = blk(16 * nf, 16 * nf, "G_middle_1")(x, seg)
        x = up_n(x)
        x = blk(16 * nf, 8 * nf, "up_0")(x, seg)
        x = up_n(x)
        x = blk(8 * nf, 4 * nf, "up_1")(x, seg)
        x = up_n(x)
        x = blk(4 * nf, 2 * nf, "up_2")(x, seg)
        x = up_b(x)
        x = blk(2 * nf, 1 * nf, "up_3")(x, seg)

        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.target_nc, (5, 5), padding=2, dtype=self.dtype,
                    name="conv_img")(x)
        return jnp.tanh(x.astype(jnp.float32))
