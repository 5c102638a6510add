"""Profiling/debug utility tests."""

import numpy as np

import jax
import jax.numpy as jnp

from vqvae_tpu.utils.debug import checked
from vqvae_tpu.utils.profiling import step_timer


def test_step_timer_measures():
    with step_timer() as t:
        x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
        t.fence(x)
    assert t.seconds is not None and t.seconds > 0


def test_checked_catches_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    err, out = jax.jit(checked(bad))(jnp.asarray(-1.0))
    try:
        err.throw()
        raised = False
    except Exception:
        raised = True
    assert raised

    err2, out2 = jax.jit(checked(bad))(jnp.asarray(1.0))
    err2.throw()  # no error
    assert float(out2) == 0.0
