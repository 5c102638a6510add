"""Decoder p_phi(x|z) (reference models/decoder.py:22-39, NHWC re-design).

ConvT(e_dim -> h, k3 s1 p1) -> ResidualStack -> ConvT(h -> h/2, k4 s2 p1) ->
ReLU -> ConvT(h/2 -> 3, k4 s2 p1). No output activation — raw linear output
against data normalized to [-1, 1] (reference models/decoder.py:30-36).

torch ConvTranspose2d default init uses fan_in = C_out*kh*kw (the weight is
stored (C_in, C_out, kh, kw) and torch counts dim 1 as fan-in) — reproduced
here for init-distribution parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vqvae_tpu.models.initializers import (
    torch_conv_bias_init,
    torch_conv_kernel_init,
)
from vqvae_tpu.models.residual import ResidualStack
from vqvae_tpu.ops.conv import conv_transpose2d


class Decoder(nn.Module):
    in_dim: int
    h_dim: int
    n_res_layers: int
    res_h_dim: int
    share_residual_weights: bool = False
    precision: str | None = None

    @nn.compact
    def __call__(self, x):
        h = self.h_dim

        def convt_params(name, cin, cout, k):
            # torch ConvTranspose2d fan_in = C_out * kh * kw
            fan_in = cout * k * k
            w = self.param(
                f"{name}_w", torch_conv_kernel_init(fan_in), (k, k, cin, cout)
            )
            b = self.param(f"{name}_b", torch_conv_bias_init(fan_in), (cout,))
            return w, b

        w1, b1 = convt_params("convt1", self.in_dim, h, 3)
        w2, b2 = convt_params("convt2", h, h // 2, 4)
        w3, b3 = convt_params("convt3", h // 2, 3, 4)

        p = self.precision
        x = conv_transpose2d(x, w1, b1, stride=1, padding=1, precision=p)
        x = ResidualStack(
            h, h, self.res_h_dim, self.n_res_layers,
            share_weights=self.share_residual_weights,
            precision=p, name="res_stack",
        )(x)
        x = nn.relu(conv_transpose2d(x, w2, b2, stride=2, padding=1, precision=p))
        return conv_transpose2d(x, w3, b3, stride=2, padding=1, precision=p)


__all__ = ["Decoder"]
