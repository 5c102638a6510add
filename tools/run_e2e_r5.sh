#!/bin/bash
# Flagship end-to-end pipeline on the real TPU, r5 edition: the RECOMMENDED
# training mode (EMA codebook + full bfloat16 — 3.97x step speed, recon 0.40
# vs 0.96, PARITY.md) driven through every stage:
#   train-vqvae 5k -> extract-latents -> train-prior (reference defaults:
#   15 layers, 100 epochs, dim 64) -> sample a 10x10 class-conditioned grid.
# Artifacts land in artifacts/e2e_r5/. TPU is single-tenant: run alone.
# pipefail: every stage is piped through tee — without it a crashed stage
# exits 0 via tee and later stages run on stale artifacts
set -e -o pipefail
cd /root/repo
OUT=artifacts/e2e_r5
mkdir -p "$OUT"
T0=$(date +%s)

python -u -m vqvae_tpu.cli train-vqvae --n_updates 5000 --steps_per_dispatch 50 \
  --ema_codebook --compute_dtype bfloat16 --quantizer_precision default \
  -save --filename e2e_r5 --results_dir "$OUT" 2>&1 | tee "$OUT/train_vqvae.log"
T1=$(date +%s)

CKPT=$(ls -t "$OUT"/vqvae_e2e_r5_step*.npz | head -1)
echo "using checkpoint $CKPT"
python -u -m vqvae_tpu.cli extract-latents --checkpoint "$CKPT" \
  --out data/latent_e_indices.npy 2>&1 | tee "$OUT/extract_latents.log"
T2=$(date +%s)

python -u -m vqvae_tpu.cli train-prior --epochs 100 --n_layers 15 --img_dim 8 \
  --steps_per_dispatch 50 -save --results_dir "$OUT" 2>&1 | tee "$OUT/train_prior.log"
T3=$(date +%s)

python -u -m vqvae_tpu.cli sample --vqvae-checkpoint "$CKPT" \
  --prior-checkpoint "$OUT/latent_block_pixelcnn.npz" --n_samples 100 \
  --out "$OUT/samples.npz" --png "$OUT/samples_grid.png" 2>&1 | tee "$OUT/sample.log"
T4=$(date +%s)

python - "$OUT" "$T0" "$T1" "$T2" "$T3" "$T4" <<'PY'
import json, sys
out = sys.argv[1]
t = [int(x) for x in sys.argv[2:]]
json.dump({
    "train_vqvae_5k_s": t[1]-t[0],
    "extract_latents_s": t[2]-t[1],
    "train_prior_100ep_s": t[3]-t[2],
    "sample_10x10_s": t[4]-t[3],
    "total_s": t[4]-t[0],
}, open(f"{out}/wall_times.json", "w"), indent=2)
print("wall times:", t[4]-t[0], "s total")
PY
echo "E2E DONE"
