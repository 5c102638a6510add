"""Class-conditional GatedPixelCNN prior (reference pixelcnn/models.py, NHWC re-design).

Architecture parity with the reference:
- dual vertical/horizontal gated conv stacks with class-conditional bias
  (pixelcnn/models.py:30-84): vert kernel (k//2+1, k) pad (k//2, k//2) cropped
  back to H rows; horiz kernel (1, k//2+1) pad (0, k//2) cropped to W cols;
  ``vert_to_horiz`` 1x1 applied to the cropped vertical features.
- layer 0 is mask 'A' (kernel 7, non-residual), the rest mask 'B' (kernel 3,
  residual) (pixelcnn/models.py:100-107).
- output head Conv1x1(dim->512) -> ReLU -> Conv1x1(512->input_dim)
  (pixelcnn/models.py:110-114).
- xavier_uniform conv weights + zero biases; N(0,1) embeddings
  (pixelcnn/models.py:10-17 — ``weights_init`` only matches *Conv* modules).

TPU-first deviations from the reference's implementation (same math):
- mask-A causality via a constant multiplicative kernel mask instead of the
  reference's in-place ``make_causal`` weight mutation on every forward
  (pixelcnn/models.py:61-67) — functional, jit-safe, and the masked weights
  receive zero gradient instead of being re-zeroed each step.
- NHWC layout; gating splits channels on the last axis.
- ``generate`` runs the full AR loop inside one jitted ``lax.fori_loop``
  (64 fused forwards for an 8x8 grid) instead of 64 eager python-loop
  forwards (pixelcnn/models.py:136-141).

The reference crops with ``x_v.size(-1)`` / ``x_h.size(-2)`` (W for a height
crop, H for a width crop) which only works for square grids; we crop with the
correct dims, identical behavior for the square grids the capability surface
uses.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqvae_tpu.config import PixelCNNConfig
from vqvae_tpu.models.initializers import normal_embedding_init, xavier_uniform_conv
from vqvae_tpu.ops.conv import conv2d


def _zeros_bias(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class GatedMaskedConv2d(nn.Module):
    mask_type: str  # 'A' | 'B'
    dim: int
    kernel: int
    residual: bool = True
    n_classes: int = 10
    precision: str | None = None

    @nn.compact
    def __call__(self, x_v, x_h, label):
        assert self.kernel % 2 == 1, "kernel size must be odd"
        d, k = self.dim, self.kernel

        class_embed = self.param(
            "class_cond_embedding", normal_embedding_init(), (self.n_classes, 2 * d)
        )
        w_vert = self.param(
            "vert_stack_w", xavier_uniform_conv(), (k // 2 + 1, k, d, 2 * d)
        )
        b_vert = self.param("vert_stack_b", _zeros_bias, (2 * d,))
        w_v2h = self.param("vert_to_horiz_w", xavier_uniform_conv(), (1, 1, 2 * d, 2 * d))
        b_v2h = self.param("vert_to_horiz_b", _zeros_bias, (2 * d,))
        w_horiz = self.param(
            "horiz_stack_w", xavier_uniform_conv(), (1, k // 2 + 1, d, 2 * d)
        )
        b_horiz = self.param("horiz_stack_b", _zeros_bias, (2 * d,))
        w_res = self.param("horiz_resid_w", xavier_uniform_conv(), (1, 1, d, d))
        b_res = self.param("horiz_resid_b", _zeros_bias, (d,))

        if self.mask_type == "A":
            # Functional causality: zero the kernel's last row (vert) / last
            # column (horiz) — the positions covering the current pixel.
            vmask = jnp.ones((k // 2 + 1, 1, 1, 1), w_vert.dtype).at[-1].set(0.0)
            w_vert = w_vert * vmask
            hmask = jnp.ones((1, k // 2 + 1, 1, 1), w_horiz.dtype).at[:, -1].set(0.0)
            w_horiz = w_horiz * hmask

        # follow the activation dtype (params stay fp32; conv2d casts its
        # weights likewise) so a bf16 compute_dtype is not silently promoted
        # back to fp32 at the first class-conditional add
        h_cls = jnp.take(class_embed, label, axis=0)[:, None, None, :].astype(
            x_v.dtype
        )  # (B,1,1,2d)

        p = self.precision
        hgt = x_v.shape[1]
        h_vert = conv2d(
            x_v, w_vert, b_vert, stride=1, padding=(k // 2, k // 2), precision=p
        )
        h_vert = h_vert[:, :hgt, :, :]
        out_v = _gate(h_vert + h_cls)

        wid = x_h.shape[2]
        h_horiz = conv2d(
            x_h, w_horiz, b_horiz, stride=1, padding=(0, k // 2), precision=p
        )
        h_horiz = h_horiz[:, :, :wid, :]
        v2h = conv2d(h_vert, w_v2h, b_v2h, precision=p)

        out = _gate(v2h + h_horiz + h_cls)
        out_h = conv2d(out, w_res, b_res, precision=p)
        if self.residual:
            out_h = out_h + x_h
        return out_v, out_h


def _gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


class GatedPixelCNN(nn.Module):
    config: PixelCNNConfig = PixelCNNConfig()

    @nn.compact
    def __call__(self, x, label):
        """x: (B, H, W) int code grid; label: (B,) int class -> (B, H, W, input_dim) logits."""
        cfg = self.config
        embedding = self.param(
            "embedding", normal_embedding_init(), (cfg.input_dim, cfg.dim)
        )
        # conv stacks run in config.compute_dtype (params stay fp32 and are
        # cast per-op; mirrors VQVAE's serving recipe, models/vqvae.py:67-77);
        # logits are returned in fp32 for the CE loss
        compute_dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        h = jnp.take(embedding, x, axis=0).astype(compute_dtype)  # (B,H,W,dim)

        x_v, x_h = h, h
        for i in range(cfg.n_layers):
            mask_type = "A" if i == 0 else "B"
            kernel = 7 if i == 0 else 3
            residual = i > 0
            x_v, x_h = GatedMaskedConv2d(
                mask_type, cfg.dim, kernel, residual, cfg.n_classes,
                precision=cfg.conv_precision, name=f"layer_{i}",
            )(x_v, x_h, label)

        w_out1 = self.param("out1_w", xavier_uniform_conv(), (1, 1, cfg.dim, 512))
        b_out1 = self.param("out1_b", _zeros_bias, (512,))
        w_out2 = self.param("out2_w", xavier_uniform_conv(), (1, 1, 512, cfg.input_dim))
        b_out2 = self.param("out2_b", _zeros_bias, (cfg.input_dim,))
        out = nn.relu(conv2d(x_h, w_out1, b_out1, precision=cfg.conv_precision))
        logits = conv2d(out, w_out2, b_out2, precision=cfg.conv_precision)
        return logits.astype(jnp.float32)

    def generate(self, label, rng, shape: Tuple[int, int] = (8, 8), batch_size: int = 64):
        """Autoregressive sampling: one full forward per pixel inside a fused
        lax.fori_loop (reference semantics — pixelcnn/models.py:129-143)."""
        hgt, wid = shape
        x0 = jnp.zeros((batch_size, hgt, wid), dtype=jnp.int32)

        def body(pos, carry):
            x, key = carry
            i, j = pos // wid, pos % wid
            logits = self(x, label)  # (B, H, W, K)
            logit_ij = jax.lax.dynamic_slice(
                logits, (0, i, j, 0), (batch_size, 1, 1, logits.shape[-1])
            )[:, 0, 0, :]
            key, sub = jax.random.split(key)
            sample = jax.random.categorical(sub, logit_ij, axis=-1).astype(jnp.int32)
            x = jax.lax.dynamic_update_slice(x, sample[:, None, None], (0, i, j))
            return (x, key)

        x, _ = jax.lax.fori_loop(0, hgt * wid, body, (x0, rng))
        return x


__all__ = ["GatedPixelCNN", "GatedMaskedConv2d"]
