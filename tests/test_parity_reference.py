"""CI regression gate: short-horizon identical-init parity vs the torch
reference (the fast version of tools/parity_torch.py; the committed 5k-update
evidence lives in artifacts/parity_5k.json via tools/parity_5k.py).

Identical init weights + identical batches + identical optimizer math => the
per-step loss trajectories must track tightly for the first ~25 steps (before
near-tie argmin flips make per-step values chaotic — measured torch-vs-torch
with a 1e-7 perturbation shows the same divergence class after that horizon).

Skipped when the read-only reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

import jax

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "models", "vqvae.py")),
    reason="torch reference checkout not available",
)

STEPS = 25
RTOL = 0.02


@pytest.mark.slow
def test_identical_init_loss_curves_track_reference(tmp_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        from models.vqvae import VQVAE as TorchVQVAE  # reference, read-only
    finally:
        sys.path.pop(0) if sys.path[0] != REFERENCE else None

    from tools.parity_torch import copy_params_to_torch
    from vqvae_tpu.config import TrainConfig, VQVAEConfig
    from vqvae_tpu.data.datasets import load_cifar10
    from vqvae_tpu.data.sampler import ReplacementSampler
    from vqvae_tpu.train.vqvae_train import VQVAETrainer

    torch.manual_seed(0)
    train_ds, _val, x_train_var, _info = load_cifar10("data")

    vq_cfg = VQVAEConfig(share_residual_weights=True, quantizer_impl="jnp")
    train_cfg = TrainConfig(batch_size=32, seed=0)
    trainer = VQVAETrainer(vq_cfg, train_cfg, x_train_var=x_train_var)
    state = trainer.init_state()
    params_np = jax.tree_util.tree_map(np.asarray, state.params)

    tmodel = TorchVQVAE(128, 32, 2, 512, 64, 0.25)
    copy_params_to_torch(params_np, tmodel, 2)
    topt = torch.optim.Adam(tmodel.parameters(), lr=3e-4, amsgrad=True)

    sampler = ReplacementSampler(len(train_ds), 32, seed=0)
    batches = [sampler.next_indices() for _ in range(STEPS)]

    t_loss = []
    for idx in batches:
        x = torch.from_numpy(train_ds.data[idx].transpose(0, 3, 1, 2))
        topt.zero_grad()
        emb_loss, x_hat, _perp = tmodel(x)
        loss = torch.mean((x_hat - x) ** 2) / x_train_var + emb_loss
        loss.backward()
        topt.step()
        t_loss.append(float(loss.detach()))

    j_loss = []
    for idx in batches:
        state, m = trainer.step(state, train_ds.data[idx])
        j_loss.append(float(m["loss"]))

    rel = np.abs(np.array(j_loss) - np.array(t_loss)) / np.abs(np.array(t_loss))
    assert rel.max() < RTOL, (
        f"loss parity broke: max per-step deviation {rel.max():.4%} over "
        f"{STEPS} steps (jax {j_loss[-3:]}, torch {t_loss[-3:]})"
    )
    # step 0 is pre-chaos: must agree to float precision
    assert rel[0] < 1e-3, f"step-0 loss deviation {rel[0]:.2e}"
