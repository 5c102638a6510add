"""5000-update convergence-parity artifact: JAX/TPU trainer vs torch reference.

The BASELINE.md north star: recon MSE within 1% of the PyTorch reference at
5k updates at identical hyperparameters. This tool produces the committed
evidence (VERDICT.md round-1 item 1):

  1. `python tools/train_reference_synth.py --steps 5000 --init_from_jax \
        --out artifacts/reference_5k_jaxinit.npz`
       -> torch reference curves (CPU), initialized from OUR deterministic
          seed-0 init so both runs start from bit-identical weights
  2. `python tools/parity_5k.py jax --steps 5000 --out artifacts/jax_5k.npz`
       -> our curves (TPU; identical dataset, sampler seed, batch schedule,
          hyperparams; share_residual_weights=True so the architecture matches
          the reference's accidental weight sharing, reference
          models/residual.py:44-45)
  3. `python tools/parity_5k.py report` -> PARITY.md + artifacts/parity_5k.json

Init note: identical init is REQUIRED for the <1% criterion. A control run
with torch's own independent init (artifacts/reference_5k_torchinit.npz)
lands ~20% away in final recon MSE at 5k updates — seed-to-seed spread of
the chaotic code-assignment dynamics dwarfs any framework difference at this
horizon, so only the identical-init comparison isolates the framework.
Step-level identical-init parity is covered separately by
tools/parity_torch.py and the CI gate tests/test_parity_reference.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WINDOW = 100  # final-window size for the convergence comparison


def run_jax(
    steps: int,
    out: str,
    batch_size: int,
    seed: int,
    conv_precision: str = "highest",
    compute_dtype: str = "float32",
    quantizer_precision: str = "highest",
    ema_codebook: bool = False,
) -> None:
    from vqvae_tpu.config import TrainConfig, VQVAEConfig
    from vqvae_tpu.data.datasets import load_dataset
    from vqvae_tpu.train.vqvae_train import train_vqvae

    import jax

    vq_cfg = VQVAEConfig(
        share_residual_weights=True,
        conv_precision=conv_precision,
        compute_dtype=compute_dtype,
        quantizer_precision=quantizer_precision,
        ema_codebook=ema_codebook,
    )
    train_cfg = TrainConfig(
        batch_size=batch_size,
        n_updates=steps,
        seed=seed,
        save=False,
        steps_per_dispatch=50,
    )
    dataset = load_dataset("CIFAR10", "data")
    print(f"backend={jax.default_backend()} dataset={dataset[3]}", flush=True)
    t0 = time.time()
    _state, history, _trainer = train_vqvae(vq_cfg, train_cfg, dataset=dataset)
    dt = time.time() - t0
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(
        out,
        recon_errors=np.array(history.recon_errors),
        loss_vals=np.array(history.loss_vals),
        perplexities=np.array(history.perplexities),
        x_train_var=dataset[2],
        backend=jax.default_backend(),
        wall_seconds=dt,
        conv_precision=conv_precision,
        compute_dtype=compute_dtype,
        quantizer_precision=quantizer_precision,
        ema_codebook=ema_codebook,
    )
    print(f"saved {out} ({steps} steps in {dt:.0f}s)", flush=True)


def _final_window(path: str, key: str = "recon_errors") -> float:
    d = np.load(path)
    c = d[key]
    return float(np.mean(c[-min(WINDOW, len(c)) :]))


def _seed_runs(art_dir: str):
    """All committed torch / jax 5k curves (torch-own-init seeds + jax seeds)."""
    import glob

    torch_paths = sorted(
        glob.glob(os.path.join(art_dir, "reference_5k_seed*.npz"))
    ) + [os.path.join(art_dir, "reference_5k_torchinit.npz")]
    jax_paths = sorted(glob.glob(os.path.join(art_dir, "jax_5k_seed*.npz"))) + [
        os.path.join(art_dir, "jax_5k.npz")
    ]
    torch_paths = [p for p in torch_paths if os.path.exists(p)]
    jax_paths = [p for p in jax_paths if os.path.exists(p)]
    return torch_paths, jax_paths


def _metric_verdict(torch_finals, jax_finals, lower_is_better=True):
    """Seed-distribution comparison with a decidable, non-gameable criterion.

    ADVICE.md round 2 (tools/parity_5k.py:144): "|t| < 2 => PASS" treats
    failure-to-reject on an underpowered test as success. Replaced with:

    - "pass":   one-sided 95% upper confidence bound (Welch-Satterthwaite df)
                on the relative means-difference (jax - torch)/torch is below
                +1% — jax certified no worse than torch+1% (the BASELINE.md
                north star), possibly because jax is genuinely better.
    - "no_detectable_bias": the two-sided 95% CI contains 0 AND the point
                estimate |dev| is smaller than torch's OWN relative seed std —
                the frameworks differ by less than torch differs from itself.
                NOT a certificate of <1%; the report states the resolvable
                margin and the run count a 1% certificate would need.
    - "bias_detected": otherwise.

    For perplexity higher is better; the non-inferiority direction flips.
    """
    from scipy import stats as sps

    nt, nj = len(torch_finals), len(jax_finals)
    t_mean, j_mean = float(np.mean(torch_finals)), float(np.mean(jax_finals))
    t_var = float(np.var(torch_finals, ddof=1)) if nt > 1 else 0.0
    j_var = float(np.var(jax_finals, ddof=1)) if nj > 1 else 0.0
    se = (t_var / nt + j_var / nj) ** 0.5
    # Welch-Satterthwaite degrees of freedom
    if se > 0 and nt > 1 and nj > 1:
        df = (t_var / nt + j_var / nj) ** 2 / (
            (t_var / nt) ** 2 / (nt - 1) + (j_var / nj) ** 2 / (nj - 1)
        )
    else:
        df = max(nt + nj - 2, 1)
    tcrit95 = float(sps.t.ppf(0.95, df)) if se > 0 else 0.0
    diff_rel = (j_mean - t_mean) / t_mean
    se_rel = se / abs(t_mean)
    welch_t = (j_mean - t_mean) / se if se > 0 else 0.0
    # adverse direction: higher is worse for losses, lower is worse for perplexity
    if lower_is_better:
        adverse_bound = diff_rel + tcrit95 * se_rel   # upper bound
    else:
        adverse_bound = -(diff_rel - tcrit95 * se_rel)  # -(lower bound)
    tcrit975 = float(sps.t.ppf(0.975, df)) if se > 0 else 0.0
    ci95 = (diff_rel - tcrit975 * se_rel, diff_rel + tcrit975 * se_rel)
    t_rel_std = (t_var**0.5) / abs(t_mean) if t_mean else 0.0
    pooled_rel_std = ((t_var + j_var) / 2) ** 0.5 / abs(t_mean)
    # runs/side for a 1% one-sided non-inferiority certificate at ~80% power
    n_needed = (
        int(np.ceil(2 * ((1.645 + 0.84) * pooled_rel_std / 0.01) ** 2))
        if pooled_rel_std > 0
        else None
    )
    if adverse_bound < 0.01:
        verdict = "pass"
    elif ci95[0] <= 0.0 <= ci95[1] and abs(diff_rel) < t_rel_std:
        verdict = "no_detectable_bias"
    else:
        verdict = "bias_detected"
    return {
        "n_torch": nt,
        "n_jax": nj,
        "torch_mean": t_mean,
        "jax_mean": j_mean,
        "torch_rel_std": t_rel_std,
        "jax_rel_std": (j_var**0.5) / abs(j_mean) if j_mean else 0.0,
        "torch_band": [float(min(torch_finals)), float(max(torch_finals))],
        "jax_band": [float(min(jax_finals)), float(max(jax_finals))],
        "rel_diff_of_means": diff_rel,
        "welch_t": welch_t,
        "welch_df": float(df),
        "ci95_rel_diff": [float(ci95[0]), float(ci95[1])],
        "adverse_bound_95": float(adverse_bound),
        "jax_mean_in_torch_band": bool(
            min(torch_finals) <= j_mean <= max(torch_finals)
        ),
        "runs_per_side_for_1pct_certificate": n_needed,
        "verdict": verdict,
    }


def _mode_fleets(art_dir: str):
    """Committed 5k fleets for the fast-training modes (VERDICT r4 item 1)
    and the EMA-codebook variant (item 2): mode -> sorted npz paths."""
    import glob

    fleets = {}
    for mode, pat in [
        ("high", "jax_5k_high_seed*.npz"),
        ("bf16", "jax_5k_bf16_seed*.npz"),
        ("ema", "jax_5k_ema_seed*.npz"),
        ("ema_bf16", "jax_5k_ema_bf16_seed*.npz"),
    ]:
        paths = sorted(glob.glob(os.path.join(art_dir, pat)))
        if paths:
            fleets[mode] = paths
    return fleets


_MODE_LABELS = {
    "high": 'conv_precision="high" (bf16x3 conv passes, fp32 elsewhere)',
    "bf16": "compute_dtype=bfloat16 + default precisions (the serving recipe)",
    "ema": "EMA codebook updates (fp32/HIGHEST; algorithm variant)",
    "ema_bf16": "EMA codebook + full bfloat16 (fastest mode x quality variant)",
}


def _mode_speedups(art_dir: str):
    """Step-speed multiplier per mode vs the fp32/HIGHEST default, computed
    from the committed batch-256 whole-window rows in train_bench.json (so
    the ladder table can never drift from the artifact of record)."""

    def pick(rows, **want):
        sel = [
            r for r in rows
            if r["batch_size"] == 256
            and r.get("steps_per_dispatch") == "window"
            and r.get("conv_precision", "highest") == want["conv"]
            and r.get("compute_dtype", "float32") == want["dtype"]
            and bool(r.get("ema_codebook")) == want["ema"]
        ]
        return sel[-1]["step_ms"] if sel else None

    try:
        with open(os.path.join(art_dir, "train_bench.json")) as f:
            rows = json.load(f)["rows"]
    except Exception:
        return {}
    base = pick(rows, conv="highest", dtype="float32", ema=False)
    if not base:
        return {}
    out = {}
    for mode, want in [
        ("high", dict(conv="high", dtype="float32", ema=False)),
        ("bf16", dict(conv="default", dtype="bfloat16", ema=False)),
        ("ema", dict(conv="highest", dtype="float32", ema=True)),
        ("ema_bf16", dict(conv="default", dtype="bfloat16", ema=True)),
    ]:
        ms = pick(rows, **want)
        if ms:
            out[mode] = f"{base / ms:.2f}x"
    return out


def _seed_span(paths) -> str:
    """Human-readable span of seed numbers in a fleet, flagging gaps."""
    import re

    seeds = sorted(
        int(m.group(1))
        for p in paths
        for m in [re.search(r"seed(\d+)\.npz$", os.path.basename(p))]
        if m
    )
    if not seeds:
        return "none"
    span = f"{seeds[0]}-{seeds[-1]}"
    missing = sorted(set(range(seeds[0], seeds[-1] + 1)) - set(seeds))
    if not missing:
        return f"{span} (contiguous, n={len(seeds)})"
    return f"{span} missing {missing} (n={len(seeds)})"


def report(ref_path: str, jax_path: str, md_out: str, json_out: str) -> int:
    ref = np.load(ref_path)
    ours = np.load(jax_path)
    n = min(len(ref["recon_errors"]), len(ours["recon_errors"]))
    w = min(WINDOW, n)

    def stats(curve):
        return float(np.mean(curve[n - w : n]))

    rows = []
    for key, label in [
        ("recon_errors", "recon MSE / x_train_var"),
        ("loss_vals", "total loss"),
        ("perplexities", "perplexity"),
    ]:
        r, j = stats(ref[key]), stats(ours[key])
        rows.append(
            {
                "metric": label,
                "torch_ref": r,
                "jax_tpu": j,
                "rel_deviation": abs(j - r) / max(abs(r), 1e-9),
            }
        )
    recon_dev = rows[0]["rel_deviation"]

    # Seed-distribution statistics: at 5k updates the reference's OWN
    # seed-to-seed spread in final recon is ~4% (the code-assignment dynamics
    # are chaotic; identical-init runs decorrelate after ~50 steps), so the
    # <1% north star is only meaningful for the MEANS of the two seed
    # distributions, not a single pair of runs.
    art_dir = os.path.dirname(ref_path) or "artifacts"
    torch_paths, jax_paths = _seed_runs(art_dir)
    metrics = {}
    for key, label, lower_better in [
        ("recon_errors", "recon", True),
        ("loss_vals", "total_loss", True),
        ("perplexities", "perplexity", False),
    ]:
        tf = [_final_window(p, key) for p in torch_paths]
        jf = [_final_window(p, key) for p in jax_paths]
        metrics[label] = _metric_verdict(tf, jf, lower_is_better=lower_better)
    rec = metrics["recon"]
    torch_finals = [_final_window(p) for p in torch_paths]
    jax_finals = [_final_window(p) for p in jax_paths]

    # Fast-training-mode fleets (VERDICT r4 items 1+2): per-mode recon
    # non-inferiority vs the SAME torch fleet, plus descriptive stats.
    ladder = {}
    speedups = _mode_speedups(art_dir)
    for mode, paths in _mode_fleets(art_dir).items():
        mode_recon = [_final_window(p) for p in paths]
        mode_loss = [_final_window(p, "loss_vals") for p in paths]
        mode_perp = [_final_window(p, "perplexities") for p in paths]
        walls = []
        for p in paths:
            with np.load(p) as d:
                if "wall_seconds" in d:
                    walls.append(float(d["wall_seconds"]))
        ladder[mode] = {
            "label": _MODE_LABELS.get(mode, mode),
            "n": len(paths),
            "files": [os.path.basename(p) for p in paths],
            "recon": _metric_verdict(torch_finals, mode_recon),
            "final_loss_mean": float(np.mean(mode_loss)),
            "final_perplexity_mean": float(np.mean(mode_perp)),
            "mean_wall_seconds": float(np.mean(walls)) if walls else None,
            "step_speedup_vs_default": speedups.get(mode),
        }
    t_mean, j_mean = rec["torch_mean"], rec["jax_mean"]
    mean_dev = abs(rec["rel_diff_of_means"])
    in_band = rec["jax_mean_in_torch_band"]
    welch_t = rec["welch_t"]
    # Primary gate: recon (the north-star metric) passes or shows no bias,
    # AND neither secondary metric shows a detectable adverse bias.
    ok = bool(
        metrics["recon"]["verdict"] in ("pass", "no_detectable_bias")
        and metrics["total_loss"]["verdict"] != "bias_detected"
        and metrics["perplexity"]["verdict"] != "bias_detected"
    )

    # checkpoints of the curve at a few milestones for the report
    milestones = [m for m in (50, 500, 1000, 2500, n - 1) if m < n]
    curve = []
    for m in milestones:
        ww = min(50, m + 1)
        curve.append(
            {
                "step": m,
                "torch_recon": float(np.mean(ref["recon_errors"][m + 1 - ww : m + 1])),
                "jax_recon": float(np.mean(ours["recon_errors"][m + 1 - ww : m + 1])),
            }
        )

    payload = {
        "steps": n,
        "window": w,
        "criterion": (
            "per metric: 'pass' if the one-sided 95% Welch upper confidence "
            "bound on the adverse relative means-difference is < +1% (the "
            "BASELINE.md north star, certified); 'no_detectable_bias' if the "
            "two-sided 95% CI contains 0 AND |diff of means| < torch's own "
            "relative seed std (frameworks differ by less than torch differs "
            "from itself); else 'bias_detected'. Overall ok = recon in "
            "{pass, no_detectable_bias} and no secondary metric shows "
            "bias_detected."
        ),
        "identical_init_pair_deviation": recon_dev,
        "torch_seed_finals": dict(zip([os.path.basename(p) for p in torch_paths], torch_finals)),
        "jax_seed_finals": dict(zip([os.path.basename(p) for p in jax_paths], jax_finals)),
        "metrics": metrics,
        "precision_ladder": ladder,
        "torch_mean": t_mean,
        "torch_rel_std": rec["torch_rel_std"],
        "jax_mean": j_mean,
        "jax_rel_std": rec["jax_rel_std"],
        "deviation_of_means": mean_dev,
        "welch_t": welch_t,
        "jax_mean_in_torch_band": bool(in_band),
        "ok": bool(ok),
        "rows": rows,
        "curve_milestones": curve,
        "jax_backend": str(ours["backend"]) if "backend" in ours else "unknown",
        "jax_wall_seconds": float(ours["wall_seconds"]) if "wall_seconds" in ours else None,
    }
    os.makedirs(os.path.dirname(json_out) or ".", exist_ok=True)
    with open(json_out, "w") as f:
        json.dump(payload, f, indent=2)

    lines = [
        "# PARITY — 5000-update convergence vs the PyTorch reference",
        "",
        f"North star (BASELINE.md): recon MSE within 1% of the reference at "
        f"{n} updates, identical hyperparameters.",
        "",
        "## Setup",
        "",
        "- Hyperparameters: reference defaults verbatim (batch 32, 512x64 codebook,",
        "  beta 0.25, Adam(3e-4, amsgrad), `share_residual_weights=True` to match the",
        "  reference's stack aliasing at models/residual.py:44-45).",
        "- Identical dataset + batch schedule: both runs draw batches from the same",
        "  `ReplacementSampler(seed=0)` over the same dataset (the synthetic CIFAR-10",
        "  fallback — this environment has no network egress, so the real CIFAR-10",
        "  download is unavailable; the comparison is apples-to-apples either way).",
        "- Identical initial weights: the torch model is initialized from our",
        "  deterministic seed-0 init (`train_reference_synth.py --init_from_jax`,",
        "  converted HWIO->OIHW by `tools/parity_torch.copy_params_to_torch`).",
        "  Control: with torch's own independent init",
        "  (`artifacts/reference_5k_torchinit.npz`) the final recon MSE lands ~20%",
        "  away — at 5k updates, init-seed spread dwarfs framework differences, so",
        "  identical init is what isolates the framework.",
        "- Torch side: `/root/reference` imported READ-ONLY, run on CPU",
        "  (`tools/train_reference_synth.py`). JAX side: this framework on "
        f"{payload['jax_backend']}",
        "  (`tools/parity_5k.py jax`).",
        "- Seed-inclusion rule (pre-registered, ADVICE r4): every launched seed",
        "  run is committed and included; no run is excluded for its result.",
        f"  Torch fleet: seeds {_seed_span(torch_paths)} plus the torch-own-",
        "  init seed-0 run (`reference_5k_torchinit.npz`); jax fleet: seeds",
        f"  {_seed_span(jax_paths)} plus the seed-0 run (`jax_5k.npz`) — the",
        "  two unseeded-filename runs are independent samples and are counted",
        "  in every n below (hence n = seed-count + 1 per side).",
        "  (Round 4's torch seeds 37-46 were launched but still in flight at",
        "  round close; round 5 completed and included them, then both fleets",
        "  were grown further.)",
        "",
        f"## Result — {'PASS' if ok else 'FAIL'}",
        "",
        "At 5k updates the training process's OWN seed-to-seed spread in final",
        f"recon MSE is {rec['torch_rel_std']:.1%} (torch, {rec['n_torch']} runs) / "
        f"{rec['jax_rel_std']:.1%} (ours, {rec['n_jax']} runs) relative std —",
        "the code-assignment dynamics are chaotic (identical-init runs",
        "decorrelate after ~50 steps; see the CI step-parity gate for the",
        "exact-math check). Certifying a 1% means-difference at this noise",
        f"floor needs ~{rec['runs_per_side_for_1pct_certificate']} runs/side; "
        f"at n={rec['n_torch']}/{rec['n_jax']} the decidable comparison is the",
        "per-metric verdict below (one-sided 95% non-inferiority bound, then",
        "a bias test floored at torch's own seed noise — see `criterion` in",
        "`artifacts/parity_5k.json`; criterion per ADVICE.md round 2):",
        "",
        "| metric | torch mean (n, rel std) | jax mean (n, rel std) | diff of "
        "means | 95% CI of diff | adverse bound (95%) | verdict |",
        "|---|---|---|---|---|---|---|",
    ] + [
        f"| {name} | {m['torch_mean']:.4f} (n={m['n_torch']}, "
        f"{m['torch_rel_std']:.1%}) | {m['jax_mean']:.4f} (n={m['n_jax']}, "
        f"{m['jax_rel_std']:.1%}) | {m['rel_diff_of_means']:+.2%} | "
        f"[{m['ci95_rel_diff'][0]:+.2%}, {m['ci95_rel_diff'][1]:+.2%}] | "
        f"{m['adverse_bound_95']:+.2%} | **{m['verdict']}** |"
        for name, m in metrics.items()
    ] + [
        "",
        "(adverse bound = one-sided 95% upper confidence limit on the relative",
        "means-difference in the direction that would make this framework worse:",
        "higher loss / lower perplexity. 'pass' certifies the BASELINE.md +1%",
        "margin; 'no_detectable_bias' additionally requires the point estimate",
        "to sit below torch's own seed noise, so it cannot be reached by just",
        "running an underpowered test.)",
        "",
        f"The framework's recon seed-mean lands {'inside' if in_band else 'outside'} "
        "the reference's observed seed band"
        + (
            ", on the better (lower-recon) side."
            if not in_band and j_mean < min(torch_finals)
            else "."
        ),
        "",
        "Identical-init paired run (torch initialized from our seed-0 weights,",
        "same batch schedule):",
        "",
        "| metric | torch reference | this framework | rel. deviation |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['metric']} | {r['torch_ref']:.6f} | {r['jax_tpu']:.6f} "
            f"| {r['rel_deviation']:.4%} |"
        )
    lines += [
        "",
        f"(Pairwise deviation {recon_dev:.2%} — dominated by chaotic decorrelation,",
        "bounded by the seed spread above, NOT a framework bias: per-seed finals",
        "from both frameworks interleave within one band.)",
        "",
        "## Trajectory (windowed recon MSE, identical-init pair)",
        "",
        "| step | torch | jax |",
        "|---|---|---|",
    ]
    for c in curve:
        lines.append(f"| {c['step']} | {c['torch_recon']:.5f} | {c['jax_recon']:.5f} |")
    lines += [
        "",
        "## Root cause of the round-2 total-loss bias: AMSGrad semantics",
        "",
        "Round-2 seeds showed a systematic bias (Welch t = -3.5 on final total",
        "loss; jax 15% lower). Root cause: `optax.amsgrad` maxes the",
        "**bias-corrected** second moment, torch 1.1.0 maxes the **raw** moment",
        "and bias-corrects with the current step's factor. After the VQ-VAE's",
        "step-~250 embedding-loss spike (where the max is set while",
        "1-b2^t ~ 0.2), optax's denominator stays ~2x larger, silently",
        "annealing the effective LR — measured post-spike steps are 0.54x",
        "torch's (tests/test_optim.py). The trainer now defaults to",
        "`amsgrad_impl=\"torch\"` (vqvae_tpu/train/optim.py), an exact",
        "reimplementation verified against torch.optim.Adam(amsgrad=True) to",
        "5e-6 through a spike schedule; all jax seed curves in this report are",
        "trained with it. (The optax variant remains available — it converges",
        "measurably LOWER at 5k updates, a free improvement when reference",
        "parity is not the goal.)",
        "",
    ]
    # Distribution-level evidence for the AMSGrad root cause: round-2 curves
    # trained with optax.amsgrad are preserved in artifacts/optax_r2/.
    optax_dir = os.path.join(art_dir, "optax_r2")
    if os.path.isdir(optax_dir):
        _, optax_paths = _seed_runs(optax_dir)
        if optax_paths:
            o_loss = [_final_window(p, "loss_vals") for p in optax_paths]
            t_loss = [_final_window(p, "loss_vals") for p in torch_paths]
            j_loss = [_final_window(p, "loss_vals") for p in jax_paths]
            lines += [
                "Distribution evidence (final-window total loss, seed means):",
                f"torch {np.mean(t_loss):.3f} / ours-with-torch-amsgrad "
                f"{np.mean(j_loss):.3f} / ours-with-optax-amsgrad "
                f"{np.mean(o_loss):.3f} ({len(optax_paths)} preserved round-2 "
                "curves, `artifacts/optax_r2/`) — switching the optimizer "
                "semantics moves the jax distribution onto torch's; the optax "
                "variant's lower loss is the LR-anneal effect.",
                "",
            ]
    lines += [
        "## Precision-ladder convergence (fast-training modes)",
        "",
        "Step speed without convergence is not a training mode. Each fast mode",
        "below ran its own 5k-update seed fleet (identical hyperparams/batch",
        "schedule; `tools/run_precision_fleet.sh`) and is judged against the",
        "SAME torch fleet with the same one-sided 95% non-inferiority bound as",
        "the headline comparison:",
        "",
        "| mode | n | final recon mean (rel std) | diff vs torch | adverse "
        "bound (95%) | verdict | in torch band | step speedup (b256) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for mode, m in ladder.items():
        r = m["recon"]
        lines.append(
            f"| `{mode}` — {m['label']} | {m['n']} | {r['jax_mean']:.4f} "
            f"({r['jax_rel_std']:.1%}) | {r['rel_diff_of_means']:+.2%} | "
            f"{r['adverse_bound_95']:+.2%} | **{r['verdict']}** | "
            f"{'yes' if r['jax_mean_in_torch_band'] else 'no'} | "
            f"{m['step_speedup_vs_default'] or '—'} |"
        )
    lines += [
        "",
        "(speedups from the committed step benches,",
        "`artifacts/train_bench.json` precision-ladder rows at batch 256;",
        "EMA is an algorithm variant, listed for its convergence behavior,",
        "its step cost is benched separately — see README. Curves:",
        "`artifacts/jax_5k_{high,bf16,ema}_seed*.npz`.)",
        "",
    ]
    if "ema" in ladder:
        em = ladder["ema"]
        er = em["recon"]
        # step cost of the EMA codebook vs the Adam-codebook default, from
        # the committed train bench (batch 256, whole-window dispatch)
        ema_cost = None
        try:
            with open(os.path.join(art_dir, "train_bench.json")) as f:
                tb_rows = json.load(f)["rows"]
            base = [
                r for r in tb_rows
                if r["batch_size"] == 256
                and r.get("steps_per_dispatch") == "window"
                and r.get("conv_precision", "highest") == "highest"
                and r.get("compute_dtype", "float32") == "float32"
                and not r.get("ema_codebook")
            ]
            # matched precision: this section describes the fp32/HIGHEST EMA
            # variant, so exclude the ema+bf16 row (quoted separately)
            ema_rows = [
                r for r in tb_rows
                if r.get("ema_codebook") and r["batch_size"] == 256
                and r.get("steps_per_dispatch") == "window"
                and r.get("compute_dtype", "float32") == "float32"
                and r.get("conv_precision", "highest") == "highest"
            ]
            if base and ema_rows:
                ema_cost = (base[-1]["step_ms"], ema_rows[-1]["step_ms"])
        except Exception:
            pass
        t_perp = metrics["perplexity"]["torch_mean"]
        lines += [
            "### EMA codebook at reference scale (VERDICT r4 item 2)",
            "",
            f"The EMA-codebook variant (van den Oord app. A.1; {em['n']} x 5k",
            "updates, fp32/HIGHEST, otherwise reference hyperparams) converges",
            f"to final-window recon {er['jax_mean']:.4f} — "
            f"{er['rel_diff_of_means']:+.1%} vs the gradient-codebook torch "
            f"mean ({er['torch_mean']:.4f}) — with final perplexity "
            f"{em['final_perplexity_mean']:.1f} vs the gradient variant's "
            f"~{t_perp:.0f}.",
            "This is an ALGORITHM difference, not framework parity: at these",
            "hyperparams the gradient codebook leaves most codes dead",
            "(perplexity ~22 of 512) while the moving-average update keeps",
            "codes tracking the encoder distribution, and the extra live",
            "codes buy the lower reconstruction error. The reference repo",
            "only implements the gradient variant",
            "(/root/reference/models/quantizer.py:63-64); EMA is this",
            "framework's north-star extension, and it also removes the",
            "codebook from the Adam state entirely.",
        ]
        if ema_cost is not None:
            lines += [
                f"Step cost at batch 256: {ema_cost[1]:.3f} ms vs "
                f"{ema_cost[0]:.3f} ms for the Adam-codebook default "
                "(`artifacts/train_bench.json`).",
            ]
        lines += [""]
    lines += [
        "Known negative result, kept for contrast: a 5k run with single-pass",
        "bf16 conv GRADIENTS (`conv_precision=\"default\"` at fp32 compute)",
        "converged to recon 1.14 — outside the reference band — which is why",
        "the training default remains `conv_precision=\"highest\"` and the",
        "fast modes above carry their own convergence evidence rather than",
        "an assumption.",
        "",
        "Raw curves: `artifacts/reference_5k_seed*.npz` + ",
        "`artifacts/reference_5k_torchinit.npz` (torch-own-init seeds),",
        "`artifacts/reference_5k_jaxinit.npz` (identical-init pair),",
        "`artifacts/jax_5k*.npz` (our seeds); summary: `artifacts/parity_5k.json`.",
        "",
        "A fast identical-init step-parity gate runs in CI:",
        "`tests/test_parity_reference.py` (25-step curves, ~1e-4 step-0 agreement).",
        "",
    ]
    with open(md_out, "w") as f:
        f.write("\n".join(lines))
    print(
        "verdicts: "
        + ", ".join(f"{k}={m['verdict']}" for k, m in metrics.items())
        + f" -> {'PARITY OK' if ok else 'PARITY FAIL'}"
    )
    print(f"wrote {md_out}, {json_out}")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    pj = sub.add_parser("jax")
    pj.add_argument("--steps", type=int, default=5000)
    pj.add_argument("--batch_size", type=int, default=32)
    pj.add_argument("--seed", type=int, default=0)
    pj.add_argument("--out", type=str, default="artifacts/jax_5k.npz")
    pj.add_argument("--conv_precision", type=str, default="highest")
    pj.add_argument("--compute_dtype", type=str, default="float32")
    pj.add_argument("--quantizer_precision", type=str, default="highest")
    pj.add_argument("--ema", action="store_true", help="EMA codebook updates")
    pr = sub.add_parser("report")
    pr.add_argument("--ref", type=str, default="artifacts/reference_5k_jaxinit.npz")
    pr.add_argument("--jax", type=str, default="artifacts/jax_5k.npz")
    pr.add_argument("--md", type=str, default="PARITY.md")
    pr.add_argument("--json", type=str, default="artifacts/parity_5k.json")
    args = ap.parse_args()
    if args.cmd == "jax":
        run_jax(
            args.steps,
            args.out,
            args.batch_size,
            args.seed,
            conv_precision=args.conv_precision,
            compute_dtype=args.compute_dtype,
            quantizer_precision=args.quantizer_precision,
            ema_codebook=args.ema,
        )
        return 0
    return report(args.ref, args.jax, args.md, args.json)


if __name__ == "__main__":
    sys.exit(main())
