#!/bin/bash
# Round-5 chip fleet: 5k-update convergence runs for the fast-training modes
# (VERDICT r4 items 1 and 2). Serial by design — the TPU is single-tenant
# (see .claude/skills/verify/SKILL.md). Each run ~60-90 s; results written
# incrementally so a crash loses at most one run.
#
#   high     : conv_precision="high" (bf16x3 passes)       — the 1.77x mode
#   bf16     : compute_dtype=bfloat16 + default precisions — the 4.10x mode
#   ema      : EMA codebook updates (fp32/HIGHEST baseline algo variant)
#   ema_bf16 : EMA codebook + full bfloat16 (quality x speed combined)
# Seed counts match the committed fleets exactly (bf16 was extended to 20
# seeds mid-round to tighten the non-inferiority CI; re-running this script
# reproduces artifacts/jax_5k_{high,bf16,ema,ema_bf16}_seed*.npz in full).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR" artifacts

run() { # run <outfile> <seed> <extra args...>
  local out="$1" seed="$2"; shift 2
  if [ -f "$out" ]; then echo "skip $out (exists)"; return 0; fi
  echo "=== $(date +%H:%M:%S) seed=$seed -> $out $*"
  timeout 900 python -u tools/parity_5k.py jax --steps 5000 \
    --seed "$seed" --out "$out" "$@" || echo "FAILED $out rc=$?"
}

for s in $(seq 1 20); do
  run "artifacts/jax_5k_high_seed${s}.npz" "$s" --conv_precision high
done
for s in $(seq 1 20); do
  run "artifacts/jax_5k_bf16_seed${s}.npz" "$s" \
    --compute_dtype bfloat16 --conv_precision default --quantizer_precision default
done
for s in 1 2 3; do
  run "artifacts/jax_5k_ema_seed${s}.npz" "$s" --ema
done
for s in 1 2 3; do
  run "artifacts/jax_5k_ema_bf16_seed${s}.npz" "$s" --ema \
    --compute_dtype bfloat16 --conv_precision default --quantizer_precision default
done
echo "=== fleet done $(date +%H:%M:%S)"
