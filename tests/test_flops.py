"""Analytic FLOP counts (utils/flops.py) cross-checked against jax's own
cost analysis where available, plus internal consistency checks used by
bench.py / tools/bench_train.py MFU reporting."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.utils.flops import (
    conv_flops,
    conv_transpose_flops,
    decoder_flops_per_image,
    encode_quantize_flops_per_image,
    encoder_flops_per_image,
    quantizer_flops_per_image,
    train_step_flops_per_image,
)


def test_conv_flops_matches_xla_cost_analysis():
    # VALID padding so XLA's padding-excluded count equals the dense count
    # (with SAME, XLA discounts border taps — 484/576 for 3x3 on 8x8 — while
    # our MFU convention is the standard dense count).
    x = jnp.zeros((1, 10, 10, 128))
    w = jnp.zeros((3, 3, 128, 32))
    f = jax.jit(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )
    cost = f.lower(x, w).compile().cost_analysis()
    xla_flops = cost[0]["flops"] if isinstance(cost, list) else cost["flops"]
    assert abs(xla_flops - conv_flops(8, 8, 128, 32, 3, 3)) / xla_flops < 0.01


def test_stack_totals_are_consistent():
    enc = encoder_flops_per_image()
    dec = decoder_flops_per_image()
    q = quantizer_flops_per_image()
    assert encode_quantize_flops_per_image() == enc + q
    # decoder ~= encoder (mirror architecture, transpose convs at same sizes)
    assert 0.5 < dec / enc < 2.0
    # train step: 3x all convs + fwd-only distances; must exceed 3x(enc+dec)
    train = train_step_flops_per_image()
    assert train > 3 * (enc + dec)
    assert train < 3 * (enc + dec + q)
