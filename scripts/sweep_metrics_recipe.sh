#!/bin/bash
# Recipe sweep for the bench metrics mode (VERDICT r3 #1): train-scene
# count x epochs on the FIXED per-split val draw (16 scenes / 64 queries,
# seed rng(1) — unchanged by any knob here). Affordable since the scanned
# trainer (distill/engine.make_scanned_train) cut the 200-epoch loop from
# ~930 s to ~160 s. Results append to /tmp/sweep_metrics.jsonl.
set -u
OUT=${OUT:-/tmp/sweep_metrics.jsonl}
cd "$(dirname "$0")/.."
for scenes in 8 16 32 64; do
  for epochs in 200; do
    echo "=== train_scenes=$scenes epochs=$epochs ===" >&2
    BENCH_METRIC=metrics \
    BENCH_METRICS_TRAIN_SCENES=$scenes \
    BENCH_METRICS_EPOCHS=$epochs \
      timeout 1800 python bench.py 2>/dev/null | tail -1 | \
      sed "s/^{/{\"train_scenes\": $scenes, \"epochs\": $epochs, /" >> "$OUT"
    tail -1 "$OUT" >&2
  done
done
