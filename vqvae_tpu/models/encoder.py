"""Encoder q_theta(z|x) (reference models/encoder.py:24-43, NHWC re-design).

Conv(3 -> h/2, k4 s2 p1) -> ReLU -> Conv(h/2 -> h, k4 s2 p1) -> ReLU ->
Conv(h -> h, k3 s1 p1) -> ResidualStack. 32x32 input -> 8x8 latent map
(4x spatial downsample).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vqvae_tpu.models.initializers import (
    torch_conv_bias_init,
    torch_conv_kernel_init,
)
from vqvae_tpu.models.residual import ResidualStack
from vqvae_tpu.ops.conv import conv2d


class Encoder(nn.Module):
    in_dim: int
    h_dim: int
    n_res_layers: int
    res_h_dim: int
    share_residual_weights: bool = False
    precision: str | None = None

    @nn.compact
    def __call__(self, x):
        h = self.h_dim

        def conv_params(name, cin, cout, k):
            fan_in = cin * k * k
            w = self.param(
                f"{name}_w", torch_conv_kernel_init(fan_in), (k, k, cin, cout)
            )
            b = self.param(f"{name}_b", torch_conv_bias_init(fan_in), (cout,))
            return w, b

        w1, b1 = conv_params("conv1", self.in_dim, h // 2, 4)
        w2, b2 = conv_params("conv2", h // 2, h, 4)
        w3, b3 = conv_params("conv3", h, h, 3)

        p = self.precision
        x = nn.relu(conv2d(x, w1, b1, stride=2, padding=1, precision=p))
        x = nn.relu(conv2d(x, w2, b2, stride=2, padding=1, precision=p))
        x = conv2d(x, w3, b3, stride=1, padding=1, precision=p)
        return ResidualStack(
            h, h, self.res_h_dim, self.n_res_layers,
            share_weights=self.share_residual_weights,
            precision=p, name="res_stack",
        )(x)


__all__ = ["Encoder"]
