"""Optimizers with reference-exact semantics.

The reference trains with ``optim.Adam(..., amsgrad=True)`` (reference
main.py:55, torch 1.1.0). ``optax.amsgrad`` implements a *different* AMSGrad
variant, and the difference is not cosmetic — it measurably changes
5k-update convergence (see PARITY.md "Root cause"):

- torch 1.1.0 (torch/optim/adam.py) keeps the running max of the **raw**
  second moment and bias-corrects it with the **current** step's factor::

      nu_max_t = max(nu_max_{t-1}, nu_t)
      update   = lr * sqrt(1 - b2^t) / (1 - b1^t) * mu_t / (sqrt(nu_max_t) + eps)

  i.e. the denominator is effectively ``sqrt(max_s nu_s / bc2_t)``.

- optax (optax/_src/transform.py scale_by_amsgrad) maxes the
  **bias-corrected** moment::

      nu_max_t = max(nu_max_{t-1}, nu_t / (1 - b2^s))   taken at each step s
      update   = lr * mu_hat_t / (sqrt(nu_max_t) + eps)

  i.e. the denominator is ``sqrt(max_s (nu_s / bc2_s))``.

When the gradient norm *peaks early and then decays* — exactly what the
VQ-VAE's step-~250 embedding-loss spike does — the max in optax's variant is
set by an early step s* whose bias-correction factor 1/bc2_{s*} is large
(bc2_250 ≈ 0.22), and it never comes back down. From then on optax's
denominator is ~sqrt(1/bc2_{s*}) ≈ 2x larger than torch's, which silently
anneals the effective learning rate ~2x for the rest of training. That
produced the systematically lower (jax-"better") final losses in the round-2
parity runs: Welch t = -3.5 on final-window total loss across seeds.

``scale_by_torch_amsgrad`` reproduces the torch math exactly (including
adding ``eps`` *outside* the raw-max square root and folding
``sqrt(bc2)/bc1`` into the step size), so the parity trainer is
semantics-identical to the reference. The optax variant remains available
via ``TrainConfig.amsgrad_impl = "optax"``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ScaleByTorchAmsgradState(NamedTuple):
    count: jnp.ndarray  # scalar int32, number of completed updates
    mu: Any             # first moment (EMA of grads)
    nu: Any             # second moment (EMA of squared grads), RAW (no bias corr.)
    nu_max: Any         # elementwise running max of the RAW second moment


def scale_by_torch_amsgrad(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AMSGrad rescaling with torch-1.1.0 semantics (see module docstring)."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByTorchAmsgradState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros(), nu_max=zeros()
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m + (1.0 - b1) * g, updates, state.mu
        )
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v + (1.0 - b2) * (g * g), updates, state.nu
        )
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        count = optax.safe_int32_increment(state.count)
        t = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(jnp.float32(b1), t)
        bc2 = 1.0 - jnp.power(jnp.float32(b2), t)
        # torch: p -= lr * sqrt(bc2)/bc1 * mu / (sqrt(nu_max) + eps)
        step_size = jnp.sqrt(bc2) / bc1
        out = jax.tree_util.tree_map(
            lambda m, v: step_size * m / (jnp.sqrt(v) + eps), mu, nu_max
        )
        return out, ScaleByTorchAmsgradState(count=count, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def torch_amsgrad(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam(amsgrad=True) with torch-1.1.0 semantics (reference main.py:55).

    State leaf structure matches ``optax.amsgrad`` (count/mu/nu/nu_max + the
    empty scale state), so round-2 checkpoints restore into either impl.
    """
    return optax.chain(
        scale_by_torch_amsgrad(b1=b1, b2=b2, eps=eps),
        optax.scale(-learning_rate),
    )


def make_optimizer(
    learning_rate: float, impl: str = "torch"
) -> optax.GradientTransformation:
    """Adam with AMSGrad, torch-default betas/eps (reference main.py:55).

    impl="torch" (default): exact torch-1.1.0 AMSGrad — the parity-faithful
    choice. impl="optax": optax's bias-corrected-max variant, which effectively
    anneals the LR after early gradient spikes (kept for comparison; it is the
    variant round-2's jax curves were trained with).
    """
    if impl == "torch":
        return torch_amsgrad(learning_rate)
    if impl == "optax":
        return optax.amsgrad(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    raise ValueError(f"unknown amsgrad_impl {impl!r} (expected 'torch' or 'optax')")


__all__ = [
    "ScaleByTorchAmsgradState",
    "scale_by_torch_amsgrad",
    "torch_amsgrad",
    "make_optimizer",
]
