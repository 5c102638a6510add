"""The vector-quantization bottleneck.

Reproduces the math of the reference ``VectorQuantizer.forward``
(reference models/quantizer.py:29-76) exactly, re-designed TPU-first:

- NHWC input (B, H, W, D) — no permutes needed (the reference permutes
  NCHW->NHWC and back; we are NHWC-native).
- The hot path — pairwise-L2 distances + argmin + codebook gather — is a single
  op ``nearest_code`` with a ``custom_vjp`` whose backward matches torch
  autodiff through ``one_hot @ codebook``: grad w.r.t. the codebook is a
  scatter-add of the cotangent over assigned rows; grad w.r.t. z is zero
  (argmin/one-hot are non-differentiable). The forward dispatches by the
  measured rule in ``_auto_impl``: the fused Pallas streaming kernel
  (ops/pallas_quantizer.py) only where it measured faster on silicon —
  big-codebook bf16 runs the kernel can cover in one codebook pass — or when
  the (N, K) score matrix is too large to materialize in HBM; everywhere
  else (including most TPU regimes) the pure-jnp path, which XLA fuses well.
- Loss terms, the straight-through estimator, and perplexity mirror the
  reference exactly:
    loss = mean((sg[z_q] - z)^2) + beta * mean((z_q - sg[z])^2)
      (reference models/quantizer.py:63-64 — note the reference puts the
       *encoder*-gradient term first with coefficient 1 and the
       *codebook*-gradient term second with coefficient beta)
    z_q_ste = z + sg[z_q - z]                  (models/quantizer.py:67)
    perplexity = exp(-sum(p log(p + 1e-10)))   (models/quantizer.py:70-71)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizeOutput(NamedTuple):
    loss: jnp.ndarray          # scalar embedding loss
    z_q: jnp.ndarray           # (B, H, W, D) straight-through quantized latents
    perplexity: jnp.ndarray    # scalar codebook-usage perplexity
    indices: jnp.ndarray       # (B, H, W) int32 code indices
    counts: jnp.ndarray        # (K,) per-code assignment counts (for usage stats)


# ---------------------------------------------------------------------------
# nearest_code: dist + argmin + gather with reference-autodiff-matching vjp
# ---------------------------------------------------------------------------


def _nearest_code_fwd_jnp(
    z_flat: jnp.ndarray, codebook: jnp.ndarray, precision: str = "highest"
):
    """Pure-jnp forward: (N, D), (K, D) -> ((N, D) z_q, (N,) int32 indices).

    Distance expansion ||z - e||^2 = z^2 + e^2 - 2 z.e (the z^2 row-constant is
    dropped — it cannot change the argmin), exactly the reference's expansion
    (models/quantizer.py:49-51) minus the per-row constant. ``precision``
    controls the distance matmul on the MXU (see ops/pallas_quantizer.py);
    the row gather is exact at any precision.
    """
    scores = jnp.sum(codebook * codebook, axis=1)[None, :] - 2.0 * jnp.matmul(
        z_flat, codebook.T, precision=_LAX_PRECISION[precision]
    )
    indices = jnp.argmin(scores, axis=1).astype(jnp.int32)
    z_q = jnp.take(codebook, indices, axis=0)
    return z_q, indices


_LAX_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def nearest_code_jnp(
    z_flat: jnp.ndarray, codebook: jnp.ndarray, precision: str = "highest"
):
    """Reference (unfused) implementation; the parity oracle for the Pallas kernel."""
    return _nearest_code_fwd_jnp(z_flat, codebook, precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def nearest_code(
    z_flat: jnp.ndarray,
    codebook: jnp.ndarray,
    precision: str = "highest",
    impl: str = "auto",
):
    """dist+argmin+gather. Differentiable like ``one_hot(argmin) @ codebook``.

    z_flat: (N, D) float; codebook: (K, D) float.
    Returns (z_q (N, D), indices (N,) int32).

    impl selects the forward backend:
    - "auto": measured dispatch (tools/autotune_quantizer.py r3+r4 sweeps,
      artifacts/autotune.json, interleaved min-of-9 timing on TPU v5e):
        * big-codebook bf16 (precision="default", K*D >= 2^19, N <= 2048 so
          one row tile covers N): the tuned Pallas streaming kernel WINS —
          mid19 (2048x4096x128) 24.5 vs 27.3 us (1.11x), stress
          (2048x8192x256) 51.6 us (167 eff TFLOP/s, 84% of the bf16 compute
          bound) vs XLA 74.4 us (1.44x) — scores stay in VMEM and the
          codebook streams exactly once.
        * everywhere else XLA wins or ties: default config 16.6 vs 18.9 us
          (fp32) / 3.9 vs 6.1 us (bf16); mid17/mid18 bf16 within noise of
          each other; stress fp32 291.8 vs 292.9 us is a statistical tie
          (the 6-pass matmul dominates either way); big-N configs where the
          codebook would re-stream lose outright (stress_big bf16: XLA
          1213 us vs Pallas 4703 us) — XLA keeps all of these.
        * scores too large for HBM: Pallas regardless of precision (the XLA
          path would have to materialize the (N, K) score matrix).
    - "pallas": force the fused streaming kernel (scores never leave VMEM).
    - "jnp": force the XLA path.
    """
    return _dispatch_forward(z_flat, codebook, precision, impl)


# scores above this are never materialized: auto switches to the Pallas
# streaming kernel (default config scores: 4 MB; stress: 64 MB; both fine)
_SCORES_HBM_BUDGET_BYTES = 2 * 1024**3
# Measured crossover (artifacts/autotune.json, r4 mid-size sweep at N=2048,
# precision="default"): XLA wins/ties through K*D = 2^18 (mid18 2048x128:
# 16.3 vs 16.7 us), Pallas wins from 2^19 up (mid19 4096x128: 24.5 vs
# 27.3 us, 1.11x; stress 8192x256 = 2^21: 51.6 vs 74.4 us, 1.44x). Route to
# Pallas at >= the measured crossover.
_PALLAS_BF16_MIN_KD = 2**19
# The wins are measured where one row tile covers all N rows (tile_n=2048
# streams the codebook exactly once). For larger N the codebook re-streams
# N/2048 times and LOSES — measured at stress_big (65536x8192x256 bf16):
# XLA 1213 us vs Pallas 4703 us (the ADVICE r3 gate, now measurement-backed).
_PALLAS_BF16_MAX_N = 2048


def _auto_impl(n: int, k: int, d: int, precision: str, on_tpu: bool) -> str:
    """The measured-dispatch rule for impl="auto" (see nearest_code docstring)."""
    if not on_tpu:
        return "jnp"
    scores_bytes = 4 * n * k
    if scores_bytes > _SCORES_HBM_BUDGET_BYTES:
        return "pallas"
    if (
        precision == "default"
        and k * d >= _PALLAS_BF16_MIN_KD
        and n <= _PALLAS_BF16_MAX_N
    ):
        return "pallas"
    return "jnp"


def _dispatch_forward(z_flat, codebook, precision, impl):
    if impl == "auto":
        impl = _auto_impl(
            z_flat.shape[0],
            codebook.shape[0],
            codebook.shape[1],
            precision,
            jax.default_backend() == "tpu",
        )
    if impl == "pallas":
        from vqvae_tpu.ops.pallas_quantizer import nearest_code_pallas

        return nearest_code_pallas(z_flat, codebook, precision=precision)
    return _nearest_code_fwd_jnp(z_flat, codebook, precision)


def _nearest_code_vjp_fwd(z_flat, codebook, precision, impl):
    z_q, indices = _dispatch_forward(z_flat, codebook, precision, impl)
    return (z_q, indices), (indices, codebook)


def _nearest_code_vjp_bwd(precision, impl, residuals, cotangents):
    indices, codebook = residuals
    g_zq, _g_idx = cotangents
    # d(one_hot @ E)/dE — scatter-add of cotangent rows into assigned codes.
    d_codebook = jax.ops.segment_sum(
        g_zq.astype(codebook.dtype), indices, num_segments=codebook.shape[0]
    )
    d_z = jnp.zeros_like(g_zq)
    return d_z, d_codebook


nearest_code.defvjp(_nearest_code_vjp_fwd, _nearest_code_vjp_bwd)


# ---------------------------------------------------------------------------
# Full quantize op
# ---------------------------------------------------------------------------


def quantize(
    z: jnp.ndarray,
    codebook: jnp.ndarray,
    beta: float,
    ema: bool = False,
    precision: str = "highest",
    impl: str = "auto",
) -> QuantizeOutput:
    """The complete VQ bottleneck on an NHWC latent map.

    z: (B, H, W, D) encoder output (post pre-quantization conv);
    codebook: (K, D).
    ema: EMA-codebook mode — the loss is only the beta-weighted commitment
    term (the codebook receives no gradient; it is updated by moving averages
    in the trainer).
    precision: distance-matmul precision — "highest" (fp32, bitwise argmin
    parity), "high" (bf16x3), or "default" (bf16 MXU, fastest; near-tie code
    assignments may flip — fine for inference). z_q rows are exact codebook
    entries at any setting.
    """
    b, h, w, d = z.shape
    k = codebook.shape[0]
    z_flat = z.reshape(-1, d)

    z_q_flat, idx_flat = nearest_code(z_flat, codebook, precision, impl)
    z_q = z_q_flat.reshape(b, h, w, d)
    indices = idx_flat.reshape(b, h, w)

    sg = jax.lax.stop_gradient
    if ema:
        loss = beta * jnp.mean((sg(z_q) - z) ** 2)
    else:
        # Reference loss ordering/coefficients (models/quantizer.py:63-64).
        loss = jnp.mean((sg(z_q) - z) ** 2) + beta * jnp.mean((z_q - sg(z)) ** 2)

    # Straight-through estimator (models/quantizer.py:67).
    z_q_ste = z + sg(z_q - z)

    # Perplexity over the batch code histogram (models/quantizer.py:70-71).
    counts = jnp.zeros((k,), dtype=z.dtype).at[idx_flat].add(1.0)
    e_mean = counts / idx_flat.shape[0]
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))

    return QuantizeOutput(
        loss=loss, z_q=z_q_ste, perplexity=perplexity, indices=indices, counts=counts
    )


__all__ = ["quantize", "nearest_code", "nearest_code_jnp", "QuantizeOutput"]
