"""Cached AR decoder tests: teacher-forced logits must match the full forward
pass exactly (the cache correctness oracle), and sampling must agree with the
reference-semantics scan sampler given identical RNG.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.config import PixelCNNConfig
from vqvae_tpu.models.pixelcnn import GatedPixelCNN
from vqvae_tpu.models.pixelcnn_sampler import CachedPixelCNNSampler


@pytest.fixture(scope="module", params=[3])
def setup(request):
    cfg = PixelCNNConfig(input_dim=32, dim=16, n_layers=request.param, n_classes=10, img_dim=8)
    model = GatedPixelCNN(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8), jnp.int32), jnp.zeros((2,), jnp.int32)
    )["params"]
    return cfg, model, params


def test_teacher_forced_logits_match_full_forward(setup):
    cfg, model, params = setup
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.integers(0, cfg.input_dim, (4, 8, 8)), jnp.int32)
    label = jnp.asarray(rng.integers(0, cfg.n_classes, (4,)), jnp.int32)

    full_logits = model.apply({"params": params}, grid, label)  # (B, H, W, K)

    sampler = CachedPixelCNNSampler(cfg, params)
    cached_logits = sampler.generate(
        label, jax.random.PRNGKey(0), shape=(8, 8), batch_size=4, force_grid=grid
    )

    np.testing.assert_allclose(
        np.asarray(cached_logits), np.asarray(full_logits), rtol=1e-4, atol=1e-5
    )


def test_sampling_matches_scan_reference(setup):
    """Same RNG schedule => identical samples as the full-forward scan sampler.

    The scan sampler splits its key once per pixel in raster order, and so
    does the cached decoder — given matching logits the categorical draws are
    identical.
    """
    cfg, model, params = setup
    label = jnp.zeros((8,), jnp.int32)
    rng = jax.random.PRNGKey(7)

    ref = model.apply(
        {"params": params}, label, rng, (8, 8), 8, method=model.generate
    )
    sampler = CachedPixelCNNSampler(cfg, params)
    fast = sampler.generate(label, rng, shape=(8, 8), batch_size=8)

    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fast))


@pytest.mark.parametrize("side", [16, 32])
def test_band_refresh_matches_full_refresh(setup, side):
    """Band-limited row refresh (depth-limited vertical band, VERDICT r4
    item 5) produces exactly the logits of the whole-grid refresh at grids
    larger than the receptive band — and both match the full forward."""
    cfg, model, params = setup
    rng = np.random.default_rng(side)
    grid = jnp.asarray(rng.integers(0, cfg.input_dim, (2, side, side)), jnp.int32)
    label = jnp.asarray(rng.integers(0, cfg.n_classes, (2,)), jnp.int32)

    full = CachedPixelCNNSampler(cfg, params, row_refresh="full").generate(
        label, jax.random.PRNGKey(0), (side, side), 2, force_grid=grid
    )
    band = CachedPixelCNNSampler(cfg, params, row_refresh="band").generate(
        label, jax.random.PRNGKey(0), (side, side), 2, force_grid=grid
    )
    # Near-machine-epsilon: the band conv has a different spatial extent than
    # the whole-grid conv, so XLA may reassociate the reductions (observed max
    # |diff| 2e-7 fp32); the math is identical.
    np.testing.assert_allclose(
        np.asarray(band), np.asarray(full), rtol=1e-5, atol=1e-6
    )

    model_logits = model.apply({"params": params}, grid, label)
    np.testing.assert_allclose(
        np.asarray(band), np.asarray(model_logits), rtol=1e-4, atol=1e-5
    )


def test_band_refresh_sampling_matches_full_refresh():
    """Sampling mode: identical RNG => identical grids from both refreshes
    (auto mode picks band at H=32 for a 3-layer stack: band = L + k0//2 + 1)."""
    cfg = PixelCNNConfig(input_dim=16, dim=8, n_layers=2, n_classes=4, img_dim=8)
    model = GatedPixelCNN(cfg)
    params = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 8, 8), jnp.int32), jnp.zeros((1,), jnp.int32)
    )["params"]
    label = jnp.zeros((4,), jnp.int32)
    rng = jax.random.PRNGKey(11)
    full = CachedPixelCNNSampler(cfg, params, row_refresh="full").generate(
        label, rng, (16, 16), 4
    )
    auto = CachedPixelCNNSampler(cfg, params).generate(label, rng, (16, 16), 4)
    assert CachedPixelCNNSampler(cfg, params)._use_band(16)  # band is smaller
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(full))


def test_fifteen_layer_config_smoke():
    """Full-size 15-layer prior: cached decode runs and matches full forward."""
    cfg = PixelCNNConfig(input_dim=64, dim=32, n_layers=15, n_classes=10, img_dim=8)
    model = GatedPixelCNN(cfg)
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 8), jnp.int32), jnp.zeros((1,), jnp.int32)
    )["params"]
    grid = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.input_dim, (2, 8, 8)), jnp.int32
    )
    label = jnp.zeros((2,), jnp.int32)
    full = model.apply({"params": params}, grid, label)
    cached = CachedPixelCNNSampler(cfg, params).generate(
        label, jax.random.PRNGKey(0), (8, 8), 2, force_grid=grid
    )
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), rtol=1e-3, atol=1e-4)
