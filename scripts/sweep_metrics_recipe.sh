#!/usr/bin/env bash
# Recipe sweep for the metrics-mode distillation gate (VERDICT r3 #1).
#
# Sweeps the train-scene count (the generalization lever the val/train
# loss gap points at) on the FIXED per-split val draw — the per-split
# rngs in bench.py:main_metrics make every arm's 64-query val set
# bit-identical, so the arms are directly comparable (the old shared-rng
# sweeps were not). Optional second axis: epochs, via SWEEP_EPOCHS.
#
# Usage: scripts/sweep_metrics_recipe.sh [out.jsonl]
# Each arm appends one JSON line: {"train_scenes": N, "epochs": E, <the
# metrics-mode JSON>, "wall_s": S}.
set -u
OUT="${1:-/tmp/sweep_metrics_recipe.jsonl}"
SCENES="${SWEEP_SCENES:-8 16 32 64}"
EPOCHS="${SWEEP_EPOCHS:-200}"
cd "$(dirname "$0")/.."

for e in $EPOCHS; do
  for n in $SCENES; do
    echo "# arm train_scenes=$n epochs=$e" >&2
    t0=$(date +%s)
    line=$(BENCH_METRIC=metrics BENCH_METRICS_TRAIN_SCENES=$n \
           BENCH_METRICS_EPOCHS=$e BENCH_MODE_TIMEOUT=1750 \
           timeout 1800 python bench.py 2>/dev/null | grep '^{' | tail -1)
    t1=$(date +%s)
    if [ -n "$line" ]; then
      python - "$OUT" "$n" "$e" "$((t1 - t0))" <<EOF
import json, sys
line = json.loads('''$line''')
rec = {"train_scenes": int(sys.argv[2]), "epochs": int(sys.argv[3]),
       "wall_s": int(sys.argv[4]), **line}
with open(sys.argv[1], "a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))
EOF
    else
      echo "# arm train_scenes=$n epochs=$e FAILED (no JSON line)" >&2
    fi
  done
done
