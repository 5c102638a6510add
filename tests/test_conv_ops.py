"""conv2d / conv_transpose2d parity vs torch (the reference's L1 framework).

These tests build torch Conv2d/ConvTranspose2d with copied weights and check
our NHWC functional ops reproduce them exactly — the correctness oracle for
the encoder/decoder stacks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vqvae_tpu.ops.conv import conv2d, conv_transpose2d

torch = pytest.importorskip("torch")


def _rand(shape, rng):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize(
    "cin,cout,k,s,p", [(3, 64, 4, 2, 1), (64, 128, 3, 1, 1), (128, 64, 1, 1, 0)]
)
def test_conv2d_matches_torch(rng, cin, cout, k, s, p):
    x = _rand((2, 16, 16, cin), rng)
    w = _rand((k, k, cin, cout), rng) * 0.1
    b = _rand((cout,), rng) * 0.1

    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), s, p))

    conv = torch.nn.Conv2d(cin, cout, k, stride=s, padding=p)
    with torch.no_grad():
        # torch weight (out, in, kh, kw) <- ours (kh, kw, in, out)
        conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(b))
        ref = conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,s,p", [(64, 128, 3, 1, 1), (128, 64, 4, 2, 1), (64, 3, 4, 2, 1)]
)
def test_conv_transpose2d_matches_torch(rng, cin, cout, k, s, p):
    x = _rand((2, 8, 8, cin), rng)
    w = _rand((k, k, cin, cout), rng) * 0.1
    b = _rand((cout,), rng) * 0.1

    ours = np.asarray(
        conv_transpose2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), s, p)
    )

    convt = torch.nn.ConvTranspose2d(cin, cout, k, stride=s, padding=p)
    with torch.no_grad():
        # torch ConvT weight (in, out, kh, kw) <- ours (kh, kw, in, out)
        convt.weight.copy_(torch.from_numpy(w.transpose(2, 3, 0, 1)))
        convt.bias.copy_(torch.from_numpy(b))
        ref = convt(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    assert ours.shape == ref.shape  # torch output-size arithmetic
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_conv4s2_space_to_depth_rewrite_is_exact():
    """The serving-path space-to-depth lowering of (k=4, s=2, p=1) convs
    (tools/bench_conv_strategy.py, VERDICT r3 item 8) computes the same MACs
    as conv2d stride-2 — identical results up to fp reassociation."""
    import numpy as np
    from tools.bench_conv_strategy import conv4s2_space_to_depth
    from vqvae_tpu.ops.conv import conv2d

    rng = np.random.default_rng(7)
    for c, f, hw in [(3, 16, 8), (16, 32, 8)]:
        x = jnp.asarray(rng.normal(size=(2, hw, hw, c)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(4, 4, c, f)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
        ref = conv2d(x, w, b, stride=2, padding=1, precision="highest")
        alt = conv4s2_space_to_depth(x, w, b, precision="highest")
        np.testing.assert_allclose(np.asarray(alt), np.asarray(ref), rtol=2e-5, atol=2e-5)
