"""Codebook-parallel quantizer: parity vs the single-device path on a 2x4 mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.ops.quantizer import nearest_code_jnp, quantize
from vqvae_tpu.parallel.code_parallel import (
    codebook_sharding,
    make_2d_mesh,
    nearest_code_sharded,
    quantize_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    return make_2d_mesh(n_data=2, n_code=4)


def _data(n=256, k=64, d=32, seed=0):
    r = np.random.default_rng(seed)
    z = jnp.asarray(r.standard_normal((n, d)), jnp.float32)
    cb = jnp.asarray(r.standard_normal((k, d)), jnp.float32)
    return z, cb


def test_forward_parity(mesh):
    z, cb = _data()
    zq_ref, idx_ref = nearest_code_jnp(z, cb)
    zq, idx = jax.jit(
        lambda a, b: nearest_code_sharded(a, b, mesh)
    )(z, jax.device_put(cb, codebook_sharding(mesh)))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq_ref), rtol=1e-6)


def test_gather_is_exact(mesh):
    """z_q rows are the exact codebook rows (psum of a one-hot mask)."""
    z, cb = _data(seed=3)
    zq, idx = nearest_code_sharded(z, cb, mesh)
    np.testing.assert_array_equal(
        np.asarray(zq), np.asarray(cb)[np.asarray(idx)]
    )


def test_quantize_sharded_matches_quantize(mesh):
    r = np.random.default_rng(1)
    z = jnp.asarray(r.standard_normal((8, 4, 4, 32)), jnp.float32)
    cb = jnp.asarray(r.standard_normal((64, 32)), jnp.float32)
    ref = quantize(z, cb, beta=0.25)
    out = jax.jit(lambda a, b: quantize_sharded(a, b, 0.25, mesh))(
        z, jax.device_put(cb, codebook_sharding(mesh))
    )
    np.testing.assert_array_equal(np.asarray(out.indices), np.asarray(ref.indices))
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=1e-6)
    np.testing.assert_allclose(
        float(out.perplexity), float(ref.perplexity), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out.z_q), np.asarray(ref.z_q), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.counts), np.asarray(ref.counts))


def test_gradients_match_unsharded(mesh):
    """Codebook + encoder grads through the sharded loss == unsharded grads."""
    r = np.random.default_rng(2)
    z = jnp.asarray(r.standard_normal((8, 4, 4, 16)), jnp.float32)
    cb = jnp.asarray(r.standard_normal((32, 16)), jnp.float32)

    def loss_ref(z, cb):
        q = quantize(z, cb, beta=0.25)
        return q.loss + jnp.mean(q.z_q**2)  # exercise the STE path too

    def loss_sharded(z, cb):
        q = quantize_sharded(z, cb, 0.25, mesh)
        return q.loss + jnp.mean(q.z_q**2)

    gz_ref, gcb_ref = jax.grad(loss_ref, argnums=(0, 1))(z, cb)
    gz, gcb = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(
        z, jax.device_put(cb, codebook_sharding(mesh))
    )
    np.testing.assert_allclose(np.asarray(gz), np.asarray(gz_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gcb), np.asarray(gcb_ref), rtol=1e-5, atol=1e-6
    )


def test_tie_breaking_matches_argmin(mesh):
    """Duplicate codebook rows across shards: winner must be the lowest index."""
    d = 8
    base = np.random.default_rng(4).standard_normal((16, d)).astype(np.float32)
    cb = jnp.asarray(np.tile(base, (4, 1)))  # 64 rows, 4 exact copies of each
    z = jnp.asarray(
        np.random.default_rng(5).standard_normal((32, d)).astype(np.float32)
    )
    _, idx_ref = nearest_code_jnp(z, cb)
    _, idx = nearest_code_sharded(z, jax.device_put(cb, codebook_sharding(mesh)), mesh)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    assert np.asarray(idx).max() < 16  # always the first copy


def test_divisibility_errors(mesh):
    z, cb = _data(k=62)
    with pytest.raises(ValueError):
        nearest_code_sharded(z, cb, mesh)
    z2, cb2 = _data(n=255)
    with pytest.raises(ValueError):
        nearest_code_sharded(z2, cb2, mesh)
