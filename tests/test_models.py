"""Encoder/Decoder/VQVAE stack tests: output shapes, latent geometry, and
full-forward parity against the reference torch implementation (imported
read-only from /root/reference) with copied weights.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.config import VQVAEConfig
from vqvae_tpu.models.vqvae import VQVAE

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def model_and_params():
    cfg = VQVAEConfig(share_residual_weights=True)
    model = VQVAE(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return cfg, model, params


def test_latent_geometry(model_and_params):
    """32x32x3 -> 8x8 code grid (4x downsample) — reference README.md:51."""
    cfg, model, params = model_and_params
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    z_e = model.apply({"params": params}, x, method=model.encode)
    assert z_e.shape == (2, 8, 8, cfg.embedding_dim)
    idx = model.apply({"params": params}, x, method=model.codes)
    assert idx.shape == (2, 8, 8)
    assert idx.dtype == jnp.int32


def test_forward_contract(model_and_params):
    """forward returns (embedding_loss, x_hat, perplexity) — vqvae.py:44."""
    cfg, model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    loss, x_hat, perp = model.apply({"params": params}, x)
    assert loss.shape == ()
    assert x_hat.shape == x.shape
    assert perp.shape == ()


def test_full_forward_parity_vs_reference_torch(model_and_params):
    """Same weights + input => same (loss, x_hat, perplexity) as the reference."""
    cfg, model, params = model_and_params
    from models.vqvae import VQVAE as TorchVQVAE  # reference, read-only

    from tools.parity_torch import copy_params_to_torch

    # The default codebook init U(-1/512, 1/512) makes all codes nearly
    # identical, so argmin assignments on random inputs are fp-order-dependent
    # near-ties; use a well-separated codebook for a deterministic comparison.
    spread_cb = jax.random.normal(jax.random.PRNGKey(42), (512, 64)) * 0.5
    params = {**params, "codebook": spread_cb}
    params_np = jax.tree_util.tree_map(np.asarray, params)
    tmodel = TorchVQVAE(128, 32, 2, 512, 64, 0.25)
    copy_params_to_torch(params_np, tmodel, 2)
    tmodel.eval()

    x = np.random.default_rng(3).standard_normal((4, 32, 32, 3)).astype(np.float32)
    loss_j, xhat_j, perp_j = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        loss_t, xhat_t, perp_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    # rtol 1e-3: cross-framework fp32 reduction-order drift on conv outputs
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-3)
    np.testing.assert_allclose(float(perp_j), float(perp_t), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(xhat_j),
        xhat_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3,
        atol=1e-4,
    )


def test_decode_codes_roundtrip(model_and_params):
    """decode(quantize(encode(x)).z_q) == decode_codes(codes(x))."""
    cfg, model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    z_e = model.apply({"params": params}, x, method=model.encode)
    q = model.apply({"params": params}, z_e, method=model.quantize)
    via_codes = model.apply({"params": params}, q.indices, method=model.decode_codes)
    # decode_codes uses raw codebook rows (no STE offset); with converged STE
    # the z_q ste equals the codebook rows only in value — here compare against
    # an explicit gather.
    direct = model.apply(
        {"params": params},
        jnp.take(params["codebook"], q.indices, axis=0),
        method=model.decode,
    )
    np.testing.assert_allclose(np.asarray(via_codes), np.asarray(direct), rtol=1e-6)


def test_independent_residual_weights_default():
    """Default config gives each residual layer its own parameters."""
    cfg = VQVAEConfig()  # share_residual_weights=False
    model = VQVAE(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    stack = params["encoder"]["res_stack"]
    assert "layer_0" in stack and "layer_1" in stack
    w0 = np.asarray(stack["layer_0"]["conv3x3"])
    w1 = np.asarray(stack["layer_1"]["conv3x3"])
    assert not np.array_equal(w0, w1)


def test_bfloat16_compute_path():
    """compute_dtype=bfloat16 runs the conv stacks in bf16 but returns fp32
    outputs and keeps the quantizer fp32."""
    cfg = VQVAEConfig(compute_dtype="bfloat16")
    model = VQVAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    loss, x_hat, perp = model.apply({"params": params}, x)
    assert x_hat.dtype == jnp.float32
    assert np.isfinite(float(loss))

    # bf16 path tracks the fp32 path loosely
    cfg32 = VQVAEConfig()
    loss32, x_hat32, _ = VQVAE(cfg32).apply({"params": params}, x)
    np.testing.assert_allclose(float(loss), float(loss32), rtol=0.1)
