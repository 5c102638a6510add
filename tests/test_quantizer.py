"""Quantizer unit tests: math parity vs a torch re-derivation of the reference
semantics (models/quantizer.py:29-76), gradient semantics of the custom_vjp,
and Pallas-kernel (interpreter mode) parity vs the pure-jnp path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.ops.quantizer import nearest_code, nearest_code_jnp, quantize

torch = pytest.importorskip("torch")


def _setup(rng, n=128, d=16, k=32):
    z = rng.standard_normal((2, 4, 4, d)).astype(np.float32)
    cb = (rng.standard_normal((k, d)) * 0.1).astype(np.float32)
    return z, cb


def _torch_reference_quantize(z_nhwc, codebook, beta):
    """Independent torch re-derivation of the reference VectorQuantizer math."""
    z = torch.from_numpy(z_nhwc).requires_grad_(True)
    w = torch.from_numpy(codebook).requires_grad_(True)
    z_flat = z.reshape(-1, w.shape[1])
    d = (
        (z_flat ** 2).sum(1, keepdim=True)
        + (w ** 2).sum(1)
        - 2 * z_flat @ w.t()
    )
    idx = d.argmin(1)
    one_hot = torch.nn.functional.one_hot(idx, w.shape[0]).float()
    z_q = (one_hot @ w).view(z.shape)
    loss = ((z_q.detach() - z) ** 2).mean() + beta * ((z_q - z.detach()) ** 2).mean()
    z_q_ste = z + (z_q - z).detach()
    e_mean = one_hot.mean(0)
    perplexity = torch.exp(-(e_mean * torch.log(e_mean + 1e-10)).sum())
    return z, w, idx, z_q_ste, loss, perplexity


def test_quantize_forward_parity_vs_torch(rng):
    z, cb, beta = *_setup(rng), 0.25
    out = quantize(jnp.asarray(z), jnp.asarray(cb), beta)
    _, _, idx_t, zq_t, loss_t, perp_t = _torch_reference_quantize(z, cb, beta)

    np.testing.assert_array_equal(
        np.asarray(out.indices).reshape(-1), idx_t.detach().numpy()
    )
    np.testing.assert_allclose(
        np.asarray(out.z_q), zq_t.detach().numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(float(out.loss), float(loss_t.detach()), rtol=1e-5)
    np.testing.assert_allclose(
        float(out.perplexity), float(perp_t.detach()), rtol=1e-5
    )


def test_quantize_gradients_match_torch(rng):
    """Backward parity: total loss grads w.r.t. encoder output and codebook.

    Uses loss = quantize.loss + mean(z_q_ste**2) as a stand-in downstream loss
    so the STE pass-through path is exercised too.
    """
    z, cb, beta = *_setup(rng), 0.25

    def loss_fn(z_, cb_):
        out = quantize(z_, cb_, beta)
        return out.loss + jnp.mean(out.z_q ** 2)

    gz, gcb = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(z), jnp.asarray(cb))

    zt, wt, _, zq_ste_t, loss_t, _ = _torch_reference_quantize(z, cb, beta)
    total = loss_t + (zq_ste_t ** 2).mean()
    total.backward()

    np.testing.assert_allclose(np.asarray(gz), zt.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gcb), wt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_nearest_code_custom_vjp_semantics(rng):
    """dz must be exactly 0; dcodebook must be the scatter-add of cotangents."""
    _, cb = _setup(rng)
    z_flat = rng.standard_normal((64, cb.shape[1])).astype(np.float32)

    def f(z_, cb_):
        z_q, _ = nearest_code(z_, cb_)
        return jnp.sum(z_q * 2.0)

    gz, gcb = jax.grad(f, argnums=(0, 1))(jnp.asarray(z_flat), jnp.asarray(cb))
    assert float(jnp.max(jnp.abs(gz))) == 0.0

    _, idx = nearest_code_jnp(jnp.asarray(z_flat), jnp.asarray(cb))
    expected = np.zeros_like(cb)
    for i in np.asarray(idx):
        expected[i] += 2.0 * np.ones(cb.shape[1])  # d(sum(2*z_q))/dE rows
    np.testing.assert_allclose(np.asarray(gcb), expected, rtol=1e-5)


@pytest.mark.parametrize("epilogue", ["where", "argmin"])
@pytest.mark.parametrize(
    "n,d,k",
    [
        (256, 64, 512),     # default config shapes
        (300, 64, 512),     # non-multiple N (padding path)
        (128, 32, 96),      # K not a multiple of 128 (codebook padding path)
        (512, 128, 1024),   # multi-K-tile path
    ],
)
def test_pallas_kernel_parity_interpret(rng, n, d, k, epilogue):
    from vqvae_tpu.ops.pallas_quantizer import nearest_code_pallas

    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    cb = jnp.asarray((rng.standard_normal((k, d)) * 0.1).astype(np.float32))
    zq_p, idx_p = nearest_code_pallas(z, cb, interpret=True, epilogue=epilogue)
    zq_j, idx_j = nearest_code_jnp(z, cb)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_j))
    np.testing.assert_allclose(np.asarray(zq_p), np.asarray(zq_j), atol=1e-5)


@pytest.mark.parametrize("epilogue", ["where", "argmin"])
def test_argmin_tie_break_first_index(epilogue):
    """torch.argmin returns the first minimum; the kernel must match."""
    cb = jnp.asarray(np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]], np.float32))
    z = jnp.asarray(np.array([[1.0, 0.0]], np.float32))  # ties rows 0 and 2
    _, idx = nearest_code_jnp(z, cb)
    assert int(idx[0]) == 0

    from vqvae_tpu.ops.pallas_quantizer import nearest_code_pallas

    _, idx_p = nearest_code_pallas(z, cb, interpret=True, epilogue=epilogue)
    assert int(idx_p[0]) == 0


def test_perplexity_bounds(rng):
    z, cb = _setup(rng)
    out = quantize(jnp.asarray(z), jnp.asarray(cb), 0.25)
    assert 1.0 <= float(out.perplexity) <= cb.shape[0]
    assert int(out.counts.sum()) == z.size // cb.shape[1]


def test_pallas_tile_override_validation(rng):
    """Misaligned explicit tiles fail loudly, not deep in Mosaic (ADVICE r2)."""
    from vqvae_tpu.ops.pallas_quantizer import nearest_code_pallas

    z, cb = _setup(rng)
    z = z.reshape(-1, z.shape[-1])
    with pytest.raises(ValueError, match="tile_k"):
        nearest_code_pallas(z, cb, interpret=True, tile_k=100)
    with pytest.raises(ValueError, match="tile_n"):
        nearest_code_pallas(z, cb, interpret=True, tile_n=12)
    # aligned overrides still work
    zq, idx = nearest_code_pallas(z, cb, interpret=True, tile_n=64, tile_k=128)
    zq_ref, idx_ref = nearest_code_jnp(z, cb)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))


def test_auto_dispatch_rule():
    """impl="auto" routes by the r3 measured sweep (artifacts/autotune.json):
    Pallas only where it won on silicon — big-codebook bf16 (1.44x at
    2048x8192x256) and unmaterializable score matrices — XLA everywhere else."""
    from vqvae_tpu.ops.quantizer import _auto_impl

    # off-TPU: always the jnp path (pallas would run in interpret mode)
    assert _auto_impl(2048, 8192, 256, "default", on_tpu=False) == "jnp"
    # default config: XLA won at every precision (16.6 vs 18.9 us fp32,
    # 3.9 vs 6.1 us bf16)
    assert _auto_impl(2048, 512, 64, "highest", on_tpu=True) == "jnp"
    assert _auto_impl(2048, 512, 64, "default", on_tpu=True) == "jnp"
    # stress fp32: statistical tie (291.8 vs 292.9 us) -> keep XLA
    assert _auto_impl(2048, 8192, 256, "highest", on_tpu=True) == "jnp"
    # r4 mid-size sweep pinning the bf16 crossover between the r3 anchors:
    # XLA wins/ties at K*D = 2^17 (15.8 vs 16.6 us) and 2^18 (16.3 vs 16.7)
    assert _auto_impl(2048, 2048, 64, "default", on_tpu=True) == "jnp"
    assert _auto_impl(2048, 2048, 128, "default", on_tpu=True) == "jnp"
    # Pallas wins from K*D = 2^19 (24.5 vs 27.3 us, 1.11x)
    assert _auto_impl(2048, 4096, 128, "default", on_tpu=True) == "pallas"
    # stress bf16: Pallas won 1.44x (51.6 vs 74.4 us)
    assert _auto_impl(2048, 8192, 256, "default", on_tpu=True) == "pallas"
    # big-N big-codebook bf16 (stress_big): with N > 2048 the codebook
    # re-streams N/2048 times and the kernel LOSES (measured r4: XLA 1213 us
    # vs Pallas 4703 us) -> XLA (the ADVICE r3 gate, measurement-backed)
    assert _auto_impl(65536, 8192, 256, "default", on_tpu=True) == "jnp"
    # scores too big for the HBM budget: Pallas at any precision
    assert _auto_impl(1 << 20, 1 << 20, 64, "highest", on_tpu=True) == "pallas"
