"""Run the reference torch implementation (read-only import) for N updates on
our synthetic dataset, recording per-step metrics. Produces the baseline curve
our TPU run is compared against (BASELINE.md: recon MSE within 1% at 5k
updates at identical hyperparameters).

CPU/torch only; jax is forced to CPU for the shared data pipeline. Writes
an .npz with recon_errors / loss_vals / perplexities.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import torch

from vqvae_tpu.data.datasets import load_cifar10
from vqvae_tpu.data.sampler import ReplacementSampler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="/tmp/reference_5k.npz")
    ap.add_argument("--log_interval", type=int, default=50)
    ap.add_argument(
        "--init_from_jax",
        action="store_true",
        help="start from OUR framework's (deterministic, seed-derived) init "
        "instead of torch's own — required for the <1%% convergence-parity "
        "criterion, since independent inits diverge far more than framework "
        "differences at 5k updates (chaotic code-assignment dynamics)",
    )
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    train_ds, _val, x_train_var, info = load_cifar10("data")
    print(f"dataset: {info}, x_train_var={x_train_var:.6f}", flush=True)

    from models.vqvae import VQVAE as TorchVQVAE  # reference, read-only

    model = TorchVQVAE(128, 32, 2, 512, 64, 0.25)
    if args.init_from_jax:
        from tools.parity_torch import copy_params_to_torch
        from vqvae_tpu.config import TrainConfig, VQVAEConfig
        from vqvae_tpu.train.vqvae_train import VQVAETrainer

        trainer = VQVAETrainer(
            VQVAEConfig(share_residual_weights=True),
            TrainConfig(batch_size=args.batch_size, seed=args.seed),
            x_train_var=x_train_var,
        )
        params_np = jax.tree_util.tree_map(
            np.asarray, trainer.init_state().params
        )
        copy_params_to_torch(params_np, model, 2)
        print("initialized torch model from the JAX seed-0 init", flush=True)
    opt = torch.optim.Adam(model.parameters(), lr=3e-4, amsgrad=True)
    sampler = ReplacementSampler(len(train_ds), args.batch_size, seed=args.seed)

    recon_errors, loss_vals, perplexities = [], [], []
    t0 = time.time()
    for i in range(args.steps):
        x = torch.from_numpy(train_ds.data[sampler.next_indices()].transpose(0, 3, 1, 2))
        opt.zero_grad()
        emb_loss, x_hat, perp = model(x)
        recon = torch.mean((x_hat - x) ** 2) / x_train_var
        loss = recon + emb_loss
        loss.backward()
        opt.step()
        recon_errors.append(float(recon))
        loss_vals.append(float(loss))
        perplexities.append(float(perp))
        if i % args.log_interval == 0:
            print(
                f"Update # {i} Recon Error: {np.mean(recon_errors[-args.log_interval:]):.6f} "
                f"Loss {np.mean(loss_vals[-args.log_interval:]):.6f} "
                f"Perplexity: {np.mean(perplexities[-args.log_interval:]):.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    np.savez(
        args.out,
        recon_errors=np.array(recon_errors),
        loss_vals=np.array(loss_vals),
        perplexities=np.array(perplexities),
        x_train_var=x_train_var,
    )
    print(f"saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
