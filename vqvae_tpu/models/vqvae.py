"""Composite VQ-VAE model (reference models/vqvae.py:11-44, NHWC re-design).

Encoder -> 1x1 pre-quantization conv -> VQ bottleneck (fused Pallas kernel on
TPU) -> Decoder. ``__call__`` returns (embedding_loss, x_hat, perplexity)
matching the reference forward contract (models/vqvae.py:44); richer outputs
(indices, z_q, counts) are available via ``encode``/``codes``/``decode_codes``
for the latent-extraction and sampling pipelines.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqvae_tpu.config import VQVAEConfig
from vqvae_tpu.models.decoder import Decoder
from vqvae_tpu.models.encoder import Encoder
from vqvae_tpu.models.initializers import (
    codebook_init,
    torch_conv_bias_init,
    torch_conv_kernel_init,
)
from vqvae_tpu.ops.conv import conv2d
from vqvae_tpu.ops.quantizer import QuantizeOutput, quantize


class VQVAE(nn.Module):
    config: VQVAEConfig = VQVAEConfig()

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(
            cfg.in_channels,
            cfg.n_hiddens,
            cfg.n_residual_layers,
            cfg.n_residual_hiddens,
            share_residual_weights=cfg.share_residual_weights,
            precision=cfg.conv_precision,
        )
        fan_in = cfg.n_hiddens  # 1x1 conv
        self.pre_quant_w = self.param(
            "pre_quant_w",
            torch_conv_kernel_init(fan_in),
            (1, 1, cfg.n_hiddens, cfg.embedding_dim),
        )
        self.pre_quant_b = self.param(
            "pre_quant_b", torch_conv_bias_init(fan_in), (cfg.embedding_dim,)
        )
        self.codebook = self.param(
            "codebook",
            codebook_init(cfg.n_embeddings),
            (cfg.n_embeddings, cfg.embedding_dim),
        )
        self.decoder = Decoder(
            cfg.embedding_dim,
            cfg.n_hiddens,
            cfg.n_residual_layers,
            cfg.n_residual_hiddens,
            share_residual_weights=cfg.share_residual_weights,
            precision=cfg.conv_precision,
        )

    @property
    def _compute_dtype(self):
        return jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32

    def encode(self, x) -> jnp.ndarray:
        """x (B, H, W, 3) -> continuous latents z_e (B, h, w, e_dim).

        Conv stacks run in ``config.compute_dtype`` (bf16 feeds the MXU at
        full rate); the quantizer input is always cast back to fp32 so code
        assignment and losses keep reference precision.
        """
        z_e = self.encoder(x.astype(self._compute_dtype))
        z_e = conv2d(
            z_e, self.pre_quant_w, self.pre_quant_b,
            precision=self.config.conv_precision,
        )
        return z_e.astype(jnp.float32)

    def quantize(self, z_e) -> QuantizeOutput:
        return quantize(
            z_e,
            self.codebook,
            self.config.beta,
            ema=self.config.ema_codebook,
            precision=self.config.quantizer_precision,
            impl=self.config.quantizer_impl,
        )

    def codes(self, x) -> jnp.ndarray:
        """x -> discrete code indices (B, h, w) int32 (latent extraction)."""
        return self.quantize(self.encode(x)).indices

    def decode(self, z_q) -> jnp.ndarray:
        return self.decoder(z_q.astype(self._compute_dtype)).astype(jnp.float32)

    def decode_codes(self, indices) -> jnp.ndarray:
        """(B, h, w) int32 code grid -> decoded images (sampling pipeline)."""
        z_q = jnp.take(self.codebook, indices, axis=0)
        return self.decoder(z_q)

    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        z_e = self.encode(x)
        q = self.quantize(z_e)
        x_hat = self.decode(q.z_q)
        return q.loss, x_hat, q.perplexity


__all__ = ["VQVAE"]
