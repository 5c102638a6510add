"""Loss-curve parity harness: our JAX trainer vs the reference torch implementation.

Imports the reference modules READ-ONLY from /root/reference (never copies
them), initializes the torch model with weights copied from our JAX init,
feeds both identical batches, runs both optimizers (Adam amsgrad, lr 3e-4),
and compares per-step recon/loss/perplexity trajectories.

With identical weights + data + optimizer math, the curves must track within
floating-point drift. This is the strongest correctness oracle available
without network access (no CIFAR download), and it exercises every parity
subtlety SURVEY.md §7 lists: shared residual weights, loss term ordering, STE,
amsgrad, x_train_var normalization.

Run on CPU only (keeps the TPU free):
    JAX_PLATFORM_NAME=cpu python tools/parity_torch.py --steps 50
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")  # reference modules, read-only

import torch

from vqvae_tpu.config import TrainConfig, VQVAEConfig
from vqvae_tpu.data.datasets import load_cifar10
from vqvae_tpu.data.sampler import ReplacementSampler
from vqvae_tpu.train.vqvae_train import VQVAETrainer


def copy_params_to_torch(params, torch_model, n_res_layers: int):
    """Copy our JAX init into the reference torch VQVAE (HWIO -> OIHW etc.)."""

    def t_conv(w):  # (kh,kw,in,out) -> (out,in,kh,kw)
        # .copy(): jax arrays view as non-writable numpy; torch warns on
        # from_numpy of a read-only buffer
        return torch.from_numpy(np.asarray(w).transpose(3, 2, 0, 1).copy())

    def t_convT(w):  # (kh,kw,in,out) -> (in,out,kh,kw)
        return torch.from_numpy(np.asarray(w).transpose(2, 3, 0, 1).copy())

    def t_vec(b):
        return torch.from_numpy(np.asarray(b).copy())

    sd = {}
    enc = params["encoder"]
    sd["encoder.conv_stack.0.weight"] = t_conv(enc["conv1_w"])
    sd["encoder.conv_stack.0.bias"] = t_vec(enc["conv1_b"])
    sd["encoder.conv_stack.2.weight"] = t_conv(enc["conv2_w"])
    sd["encoder.conv_stack.2.bias"] = t_vec(enc["conv2_b"])
    sd["encoder.conv_stack.4.weight"] = t_conv(enc["conv3_w"])
    sd["encoder.conv_stack.4.bias"] = t_vec(enc["conv3_b"])
    # Reference stack aliases ONE ResidualLayer (residual.py:44-45); our
    # share_residual_weights=True parameterization matches it.
    res = enc["res_stack"]["ResidualLayer_0"]
    for i in range(n_res_layers):
        sd[f"encoder.conv_stack.5.stack.{i}.res_block.1.weight"] = t_conv(res["conv3x3"])
        sd[f"encoder.conv_stack.5.stack.{i}.res_block.3.weight"] = t_conv(res["conv1x1"])

    sd["pre_quantization_conv.weight"] = t_conv(params["pre_quant_w"])
    sd["pre_quantization_conv.bias"] = t_vec(params["pre_quant_b"])
    sd["vector_quantization.embedding.weight"] = t_vec(params["codebook"])

    dec = params["decoder"]
    sd["decoder.inverse_conv_stack.0.weight"] = t_convT(dec["convt1_w"])
    sd["decoder.inverse_conv_stack.0.bias"] = t_vec(dec["convt1_b"])
    resd = dec["res_stack"]["ResidualLayer_0"]
    for i in range(n_res_layers):
        sd[f"decoder.inverse_conv_stack.1.stack.{i}.res_block.1.weight"] = t_conv(resd["conv3x3"])
        sd[f"decoder.inverse_conv_stack.1.stack.{i}.res_block.3.weight"] = t_conv(resd["conv1x1"])
    sd["decoder.inverse_conv_stack.2.weight"] = t_convT(dec["convt2_w"])
    sd["decoder.inverse_conv_stack.2.bias"] = t_vec(dec["convt2_b"])
    sd["decoder.inverse_conv_stack.4.weight"] = t_convT(dec["convt3_w"])
    sd["decoder.inverse_conv_stack.4.bias"] = t_vec(dec["convt3_b"])

    missing, unexpected = torch_model.load_state_dict(sd, strict=True), None
    return torch_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rtol", type=float, default=0.02)
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    torch.use_deterministic_algorithms(True)

    train_ds, _val, x_train_var, info = load_cifar10("data")
    print(f"dataset: {info}, x_train_var={x_train_var:.6f}")

    vq_cfg = VQVAEConfig(share_residual_weights=True, quantizer_impl="jnp")
    train_cfg = TrainConfig(batch_size=args.batch_size, seed=args.seed)
    trainer = VQVAETrainer(vq_cfg, train_cfg, x_train_var=x_train_var)
    state = trainer.init_state()
    params_np = jax.tree_util.tree_map(np.asarray, state.params)

    from models.vqvae import VQVAE as TorchVQVAE  # reference, read-only

    tmodel = TorchVQVAE(128, 32, 2, 512, 64, 0.25)
    copy_params_to_torch(params_np, tmodel, 2)
    topt = torch.optim.Adam(tmodel.parameters(), lr=3e-4, amsgrad=True)

    sampler = ReplacementSampler(len(train_ds), args.batch_size, seed=args.seed)
    batches = [sampler.next_indices() for _ in range(args.steps)]

    # --- torch side ---
    t_loss, t_recon, t_perp = [], [], []
    for idx in batches:
        x = torch.from_numpy(train_ds.data[idx].transpose(0, 3, 1, 2))
        topt.zero_grad()
        emb_loss, x_hat, perp = tmodel(x)
        recon = torch.mean((x_hat - x) ** 2) / x_train_var
        loss = recon + emb_loss
        loss.backward()
        topt.step()
        t_loss.append(float(loss))
        t_recon.append(float(recon))
        t_perp.append(float(perp))

    # --- jax side ---
    j_loss, j_recon, j_perp = [], [], []
    for idx in batches:
        state, m = trainer.step(state, train_ds.data[idx])
        j_loss.append(float(m["loss"]))
        j_recon.append(float(m["recon_error"]))
        j_perp.append(float(m["perplexity"]))

    print(f"{'step':>4} {'j_loss':>10} {'t_loss':>10} {'j_recon':>10} "
          f"{'t_recon':>10} {'j_perp':>8} {'t_perp':>8}")
    for i in range(args.steps):
        print(f"{i:>4} {j_loss[i]:>10.5f} {t_loss[i]:>10.5f} "
              f"{j_recon[i]:>10.5f} {t_recon[i]:>10.5f} "
              f"{j_perp[i]:>8.2f} {t_perp[i]:>8.2f}")

    rel = np.abs(np.array(j_loss) - np.array(t_loss)) / np.maximum(
        np.abs(np.array(t_loss)), 1e-6
    )
    print(f"\nmax relative loss deviation over {args.steps} steps: {rel.max():.4%}")

    # Primary criterion (BASELINE.md): windowed recon-error parity. Per-step
    # total-loss deviation grows chaotically after ~25 steps (near-tie argmin
    # flips amplified by the unstable early regime — torch-vs-torch with a
    # 1e-7 perturbation shows the same class of divergence), while the recon
    # error tracks the attractor.
    window = min(50, max(10, args.steps // 4))
    jr = float(np.mean(j_recon[-window:]))
    tr = float(np.mean(t_recon[-window:]))
    recon_dev = abs(jr - tr) / tr
    print(
        f"windowed recon error (last {window}): jax {jr:.5f} torch {tr:.5f} "
        f"-> deviation {recon_dev:.4%}"
    )
    if args.steps <= 25:
        ok = rel.max() < args.rtol
    else:
        ok = recon_dev < args.rtol
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
