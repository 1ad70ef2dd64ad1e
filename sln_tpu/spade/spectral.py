"""Spectral normalization via power iteration (training path).

torch.nn.utils.spectral_norm equivalent: the kernel is divided by its
leading singular value, estimated with one power-iteration step per
training forward; u/v vectors live in the 'spectral' variable collection.
(Inference-time checkpoints from the reference arrive with sigma already
folded — sln_tpu.spade.port.)
"""

from __future__ import annotations

from typing import Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


class SpectralConv(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, str] = 0
    use_bias: bool = True
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features))
        # torch reshapes OIHW to (out, in*kh*kw); match that factorization
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)
        dim_v = w_mat.shape[1]

        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(jax.random.PRNGKey(0),
                                      (self.features,)))
        v_var = self.variable(
            "spectral", "v",
            lambda: jax.random.normal(jax.random.PRNGKey(1), (dim_v,)))

        u, v = u_var.value, v_var.value

        def power_iter(u, n):
            for _ in range(n):
                v = w_mat.T @ u
                v = v / jnp.maximum(jnp.linalg.norm(v), self.eps)
                u = w_mat @ v
                u = u / jnp.maximum(jnp.linalg.norm(u), self.eps)
            return (jax.lax.stop_gradient(u), jax.lax.stop_gradient(v))

        if self.is_initializing():
            # converge the singular-vector estimate at init so sigma is
            # sane from the first step (torch normalizes + iterates at
            # registration time)
            u, v = power_iter(u / jnp.linalg.norm(u), 8)
            u_var.value, v_var.value = u, v
        elif train:
            # one power-iteration step per training forward
            # (torch n_power_iterations=1)
            u, v = power_iter(u, 1)
            u_var.value, v_var.value = u, v
        sigma = u @ (w_mat @ v)
        kernel_sn = kernel / jnp.maximum(sigma, self.eps)

        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        strides = self.strides
        if isinstance(strides, int):
            strides = (strides, strides)
        y = jax.lax.conv_general_dilated(
            x, kernel_sn, window_strides=strides, padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias
        return y
