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
    """Factored as `seg_mods` (every segmentation-conditioned branch:
    per-scale resizes + depth/shared/gamma/beta convs of all 17 SPADE
    norms) + `decode` (the z-dependent pass). In the serving workload seg
    is FIXED per room while 50 z vary (testing/test_SPADE_shade.py:74-80),
    so gan_shade.colorize runs seg_mods once per room and amortizes it
    across every z chunk. `__call__` = decode(seg_mods(seg), z), which is
    the reference forward exactly (parity-tested vs torch)."""
    semantic_nc: int = 41
    target_nc: int = 3
    nz: int = 256
    ngf: int = 64
    crop_size: int = 256
    n_up: str = "normal"
    # conv compute dtype; params stay fp32. bfloat16 runs the MXU at full
    # rate (the fp32 path decomposes each conv into 3 bf16 passes on TPU)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        nf = self.ngf
        sw = self._sw()
        # dtype plumbed so bf16 mode is uniform end-to-end: serving can
        # then store the (large, 256 x 16nf*sw^2) fc weights in bf16 with
        # bit-identical output (make_spade_model)
        self.fc = nn.Dense(16 * nf * sw * sw, dtype=self.dtype)

        def blk(fin, fout):
            return SPADEResnetBlock4(fin, fout, dtype=self.dtype)

        self.head_0 = blk(16 * nf, 16 * nf)
        self.G_middle_0 = blk(16 * nf, 16 * nf)
        self.G_middle_1 = blk(16 * nf, 16 * nf)
        self.up_0 = blk(16 * nf, 8 * nf)
        self.up_1 = blk(8 * nf, 4 * nf)
        self.up_2 = blk(4 * nf, 2 * nf)
        self.up_3 = blk(2 * nf, 1 * nf)
        self.conv_img = nn.Conv(self.target_nc, (5, 5), padding=2,
                                dtype=self.dtype)

    def _sw(self) -> int:
        num_up = {"normal": 5, "more": 6, "most": 7}[self.n_up]
        return self.crop_size // (2 ** num_up)

    def seg_mods(self, seg: jnp.ndarray):
        """seg: (B, H, W, 41), depth in channel 0 -> pytree of per-block
        (gamma, beta) stacks at each scale of the upsampling schedule."""
        sw = self._sw()
        # F.interpolate default mode is NEAREST here (reference :1579);
        # SPADE4.mods' bilinear resize to the same (sw, sw) is an identity
        seg_1 = resize_nearest(seg, sw, sw)
        return {
            "head_0": self.head_0.mods(seg_1, sw, sw),
            "G_middle_0": self.G_middle_0.mods(seg, 2 * sw, 2 * sw),
            "G_middle_1": self.G_middle_1.mods(seg, 2 * sw, 2 * sw),
            "up_0": self.up_0.mods(seg, 4 * sw, 4 * sw),
            "up_1": self.up_1.mods(seg, 8 * sw, 8 * sw),
            "up_2": self.up_2.mods(seg, 16 * sw, 16 * sw),
            "up_3": self.up_3.mods(seg, 32 * sw, 32 * sw),
        }

    def decode(self, mods, z: jnp.ndarray) -> jnp.ndarray:
        """z: (B, nz); mods from seg_mods (batch 1 broadcasts over B).
        Returns (B, crop, crop, 3) fp32 in [-1, 1]."""
        nf = self.ngf
        sw = self._sw()
        x = self.fc(z)
        # torch reshapes NCHW: (B, 16nf, sh, sw) -> NHWC transpose
        x = x.reshape(-1, 16 * nf, sw, sw).transpose(0, 2, 3, 1)
        x = x.astype(self.dtype)                 # residual stream dtype

        def up_n(t):
            return resize_nearest(t, t.shape[1] * 2, t.shape[2] * 2)

        def up_b(t):
            return resize_bilinear(t, t.shape[1] * 2, t.shape[2] * 2)

        x = self.head_0.from_mods(x, mods["head_0"])
        x = up_n(x)
        x = self.G_middle_0.from_mods(x, mods["G_middle_0"])
        x = self.G_middle_1.from_mods(x, mods["G_middle_1"])
        x = up_n(x)
        x = self.up_0.from_mods(x, mods["up_0"])
        x = up_n(x)
        x = self.up_1.from_mods(x, mods["up_1"])
        x = up_n(x)
        x = self.up_2.from_mods(x, mods["up_2"])
        x = up_b(x)
        x = self.up_3.from_mods(x, mods["up_3"])

        x = nn.leaky_relu(x, 0.2)
        x = self.conv_img(x)
        return jnp.tanh(x.astype(jnp.float32))

    def __call__(self, seg: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        """seg: (B, H, W, 41) NHWC (depth in channel 0); z: (B, 256).
        Returns (B, 256, 256, 3) fp32 in [-1, 1]."""
        return self.decode(self.seg_mods(seg), z)
