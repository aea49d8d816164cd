#!/bin/bash
# Number-of-views ablation (reference scripts/RUN_view_abls.sh:
# 1,3,6,9,12,24,36,48,60,73 views).
set -e
DS=${DS:-Synthetic}
ROOT=${ROOT:-}
CKPT=${CKPT:-}
MODEL=${MODEL:-tiny-test}
VIEWS=${VIEWS:-"1 2 3 4"}   # real data: "1 3 6 9 12 24 36 48 60 73"
EXTRA=${EXTRA:-}
# teacher-feature cache shared across the grid (reference chp_folder); CACHE= disables
CACHE=${CACHE-results/view_abls/.feat_cache}
[ -n "$CACHE" ] && EXTRA="$EXTRA --cache-dir $CACHE"
[ -n "$ROOT" ] && EXTRA="$EXTRA -r $ROOT"
[ -n "$CKPT" ] && EXTRA="$EXTRA --clip-checkpoint $CKPT"

mkdir -p results/views
for v in $VIEWS; do
  echo "=== n_views=$v ==="
  python -m dropclip_tpu.tools.run_eval -ds "$DS" --clip-model "$MODEL" \
    --n_views "$v" --use_obj_prior 1 \
    --save-results "results/views/views-${v}.json" $EXTRA
done
