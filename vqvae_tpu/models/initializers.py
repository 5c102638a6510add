"""Weight initializers matching the reference's (torch-default / explicit) schemes.

Loss-curve parity with the reference requires matching init *distributions*
(SURVEY.md §7). The reference relies on:

- torch Conv2d/ConvTranspose2d defaults: kaiming_uniform(a=sqrt(5)) for weights
  — which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for biases.
- codebook: U(-1/n_e, 1/n_e)  (reference models/quantizer.py:26-27).
- PixelCNN: xavier_uniform weights, zero biases (reference pixelcnn/models.py:10-17).

All kernels here are stored in HWIO layout: (kh, kw, C_in, C_out), where C_in is
the channel count of the tensor the convolution CONSUMES (for transposed convs
that is still the op's input tensor — see ops/conv.py for the fan_in subtlety).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_conv_kernel_init(fan_in: int):
    """torch nn.Conv2d default weight init == U(-b, b), b = 1/sqrt(fan_in).

    (kaiming_uniform with a=sqrt(5): gain = sqrt(2/(1+5)) = sqrt(1/3),
    bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in).)
    """

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_conv_bias_init(fan_in: int):
    """torch nn.Conv2d default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def xavier_uniform_conv():
    """xavier_uniform over an HWIO conv kernel (PixelCNN init — reference pixelcnn/models.py:13)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        fan_in = cin * kh * kw
        fan_out = cout * kh * kw
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def codebook_init(n_embeddings: int):
    """Codebook init U(-1/n_e, 1/n_e) (reference models/quantizer.py:27)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / n_embeddings
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def normal_embedding_init():
    """torch nn.Embedding default: N(0, 1) (PixelCNN token/class embeddings)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)

    return init


__all__ = [
    "torch_conv_kernel_init",
    "torch_conv_bias_init",
    "xavier_uniform_conv",
    "codebook_init",
    "normal_embedding_init",
]
