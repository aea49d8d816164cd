#!/bin/bash
# Similarity-kernel / negatives / method ablation sweep
# (reference scripts/RUN_sim_kernel.bash grid). Set DS/ROOT/CKPT for real
# data; defaults run the synthetic smoke grid.
set -e
DS=${DS:-Synthetic}
ROOT=${ROOT:-}
CKPT=${CKPT:-}
MODEL=${MODEL:-tiny-test}
EXTRA=${EXTRA:-}
# teacher-feature cache shared across the grid (reference chp_folder); CACHE= disables
CACHE=${CACHE-results/sim_kernel/.feat_cache}
[ -n "$CACHE" ] && EXTRA="$EXTRA --cache-dir $CACHE"
[ -n "$ROOT" ] && EXTRA="$EXTRA -r $ROOT"
[ -n "$CKPT" ] && EXTRA="$EXTRA --clip-checkpoint $CKPT"

mkdir -p results/sim_kernel
for kernel in max mean; do
  for kq in cls open; do
    for neg in generic scene none all; do
      for method in paired argmax; do
        tag="kernel-${kernel}_kq-${kq}_neg-${neg}_method-${method}"
        echo "=== $tag ==="
        python -m dropclip_tpu.tools.run_eval -ds "$DS" --clip-model "$MODEL" \
          --use_obj_prior 1 --use_similarity 1 --use_sim_kernel "$kernel" \
          --kernel_queries "$kq" --sim_negatives "$neg" --sim_method "$method" \
          --save-results "results/sim_kernel/${tag}.json" $EXTRA
      done
    done
  done
done
