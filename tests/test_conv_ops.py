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
