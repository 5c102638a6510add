"""Residual blocks (reference models/residual.py, re-designed NHWC/functional).

ResidualLayer (reference models/residual.py:16-29): the reference writes
``x + res_block(x)`` with res_block = [ReLU(inplace), Conv3x3(bias=False),
ReLU(inplace), Conv1x1(bias=False)] — but the INPLACE first ReLU mutates ``x``
itself before the addition, so the function actually computed (verified
empirically against torch) is

    relu(x) + Conv1x1(ReLU(Conv3x3(relu(x))))

i.e. the skip connection carries relu(x), not x. We reproduce that exact
behavior (it is what every trained reference checkpoint encodes).

ResidualStack applies ``n`` layers then a final ReLU (models/residual.py:47-51).
The reference also builds its stack as ``[ResidualLayer(...)]*n`` which
aliases ONE module across the stack, so all layers share weights
(models/residual.py:44-45 — an accident of Python list multiplication). We
default to independent weights per layer (the intended architecture); set
``share_weights=True`` for strict parity with the reference's parameterization.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vqvae_tpu.models.initializers import torch_conv_kernel_init
from vqvae_tpu.ops.conv import conv2d


class ResidualLayer(nn.Module):
    in_dim: int
    h_dim: int
    res_h_dim: int
    precision: str | None = None

    @nn.compact
    def __call__(self, x):
        w1 = self.param(
            "conv3x3",
            torch_conv_kernel_init(self.in_dim * 3 * 3),
            (3, 3, self.in_dim, self.res_h_dim),
        )
        w2 = self.param(
            "conv1x1",
            torch_conv_kernel_init(self.res_h_dim * 1 * 1),
            (1, 1, self.res_h_dim, self.h_dim),
        )
        # reference-exact: the inplace ReLU turns the skip into relu(x) too
        xr = nn.relu(x)
        h = conv2d(xr, w1, stride=1, padding=1, precision=self.precision)
        h = conv2d(nn.relu(h), w2, stride=1, padding=0, precision=self.precision)
        return xr + h


class ResidualStack(nn.Module):
    in_dim: int
    h_dim: int
    res_h_dim: int
    n_res_layers: int
    share_weights: bool = False
    precision: str | None = None

    @nn.compact
    def __call__(self, x):
        if self.share_weights:
            layer = ResidualLayer(
                self.in_dim, self.h_dim, self.res_h_dim, precision=self.precision
            )
            for _ in range(self.n_res_layers):
                x = layer(x)
        else:
            for i in range(self.n_res_layers):
                x = ResidualLayer(
                    self.in_dim, self.h_dim, self.res_h_dim,
                    precision=self.precision, name=f"layer_{i}",
                )(x)
        return nn.relu(x)


__all__ = ["ResidualLayer", "ResidualStack"]
