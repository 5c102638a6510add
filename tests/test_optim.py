"""torch-exact AMSGrad (train/optim.py) vs torch.optim.Adam(amsgrad=True).

The reference trains with torch-1.1.0 Adam(amsgrad=True) (reference
main.py:55). These tests pin the two facts PARITY.md's root-cause section
rests on:

1. `torch_amsgrad` reproduces torch's parameter trajectory to float32
   round-off on a gradient schedule that spikes then decays — the regime
   where AMSGrad variants disagree (the VQ-VAE's step-~250 loss spike).
2. `optax.amsgrad` does NOT: after the spike its bias-corrected-max
   denominator stays inflated, shrinking steps vs torch (the systematic
   "jax converges lower" bias in the round-2 parity seeds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from vqvae_tpu.train.optim import make_optimizer, torch_amsgrad


def _grad_schedule(n_steps: int, dim: int) -> np.ndarray:
    """Deterministic gradients that spike at step ~10 then decay 100x.

    Mirrors the VQ-VAE embedding-loss spike (PARITY.md): the running max of
    the second moment is set mid-run while the bias-correction factor is
    still far from 1, which is exactly where the torch and optax AMSGrad
    variants diverge.
    """
    rng = np.random.default_rng(7)
    base = rng.normal(size=(n_steps, dim)).astype(np.float32)
    scale = np.ones(n_steps, dtype=np.float32) * 0.05
    scale[8:14] = 5.0          # the spike
    scale[14:] = 0.05 * np.exp(-np.arange(n_steps - 14) / 20.0)
    return base * scale[:, None]


def _run_torch(grads: np.ndarray, lr: float) -> np.ndarray:
    p = torch.zeros(grads.shape[1], dtype=torch.float64, requires_grad=True)
    # float64 master copy so torch is the high-precision oracle
    opt = torch.optim.Adam([p], lr=lr, betas=(0.9, 0.999), eps=1e-8, amsgrad=True)
    traj = []
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g).double()
        opt.step()
        traj.append(p.detach().numpy().copy())
    return np.stack(traj)


def _run_optax(tx, grads: np.ndarray, lr: float) -> np.ndarray:
    params = jnp.zeros(grads.shape[1], dtype=jnp.float32)
    state = tx.init(params)
    step = jax.jit(lambda g, s, p: tx.update(g, s, p))
    traj = []
    for g in grads:
        updates, state = step(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
        traj.append(np.asarray(params))
    return np.stack(traj)


def test_torch_amsgrad_matches_torch_through_spike():
    grads = _grad_schedule(60, 32)
    lr = 3e-4
    ours = _run_optax(torch_amsgrad(lr), grads, lr)
    ref = _run_torch(grads, lr)
    # float32 vs float64 oracle: round-off only, across the whole trajectory
    err = np.max(np.abs(ours - ref))
    assert err < 5e-6, f"torch-semantics AMSGrad deviates from torch by {err}"


def test_optax_amsgrad_diverges_after_spike():
    """Documents the root cause: optax's variant is NOT the reference's."""
    grads = _grad_schedule(60, 32)
    lr = 3e-4
    theirs = _run_optax(optax.amsgrad(lr, b1=0.9, b2=0.999, eps=1e-8), grads, lr)
    ours = _run_optax(torch_amsgrad(lr), grads, lr)
    ref = _run_torch(grads, lr)
    # optax's max-of-bias-corrected-nu denominator deviates orders of
    # magnitude more than our round-off-level match...
    assert np.max(np.abs(theirs - ref)) > 100 * np.max(np.abs(ours - ref))
    # ...and takes systematically SMALLER steps than torch after the spike
    # (~0.54x measured — the effective-LR anneal behind the round-2 bias)
    ours_step = np.abs(np.diff(theirs[-20:], axis=0)).mean()
    ref_step = np.abs(np.diff(ref[-20:], axis=0)).mean()
    assert ours_step < 0.8 * ref_step, (
        f"expected optax post-spike steps < 0.8x torch's, got "
        f"{ours_step / ref_step:.3f}x — if optax fixed scale_by_amsgrad, "
        f"re-evaluate train/optim.py"
    )


def test_make_optimizer_dispatch():
    assert make_optimizer(1e-3, "torch") is not None
    assert make_optimizer(1e-3, "optax") is not None
    with pytest.raises(ValueError):
        make_optimizer(1e-3, "adamw")


def test_state_leaf_structure_matches_optax():
    """Round-2 checkpoints (optax.amsgrad state) restore into either impl."""
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros(3)}
    s_torch = torch_amsgrad(1e-3).init(params)
    s_optax = optax.amsgrad(1e-3).init(params)
    l1 = jax.tree_util.tree_leaves(s_torch)
    l2 = jax.tree_util.tree_leaves(s_optax)
    assert [x.shape for x in l1] == [x.shape for x in l2]
    assert [x.dtype for x in l1] == [x.dtype for x in l2]
