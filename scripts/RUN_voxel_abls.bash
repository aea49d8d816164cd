#!/bin/bash
# Voxel-size ablation (reference scripts/RUN_voxel_abls.bash:
# 0.002 - 0.008).
set -e
DS=${DS:-Synthetic}
ROOT=${ROOT:-}
CKPT=${CKPT:-}
MODEL=${MODEL:-tiny-test}
SIZES=${SIZES:-"0.005 0.01 0.02"}   # real data: "0.002 0.004 0.006 0.008"
EXTRA=${EXTRA:-}
# teacher-feature cache shared across the grid (reference chp_folder); CACHE= disables
CACHE=${CACHE-results/voxel_abls/.feat_cache}
[ -n "$CACHE" ] && EXTRA="$EXTRA --cache-dir $CACHE"
[ -n "$ROOT" ] && EXTRA="$EXTRA -r $ROOT"
[ -n "$CKPT" ] && EXTRA="$EXTRA --clip-checkpoint $CKPT"

mkdir -p results/voxel
for vs in $SIZES; do
  echo "=== voxel_size=$vs ==="
  python -m dropclip_tpu.tools.run_eval -ds "$DS" --clip-model "$MODEL" \
    --voxel_size "$vs" --use_obj_prior 1 \
    --save-results "results/voxel/voxel-${vs}.json" $EXTRA
done
