#!/bin/bash
# Visual-prompt ablation (reference scripts/RUN_clip_prompt_abls.sh:
# crop / crop-mask / mask-blur / mask-gray / mask-out x levels x expansion).
set -e
DS=${DS:-Synthetic}
ROOT=${ROOT:-}
CKPT=${CKPT:-}
MODEL=${MODEL:-tiny-test}
EXTRA=${EXTRA:-}
# teacher-feature cache shared across the grid (reference chp_folder); CACHE= disables
CACHE=${CACHE-results/clip_prompt/.feat_cache}
[ -n "$CACHE" ] && EXTRA="$EXTRA --cache-dir $CACHE"
[ -n "$ROOT" ] && EXTRA="$EXTRA -r $ROOT"
[ -n "$CKPT" ] && EXTRA="$EXTRA --clip-checkpoint $CKPT"

mkdir -p results/prompts
for prompt in crop crop-mask mask-blur mask-gray mask-out crop-mask,mask-blur; do
  for levels in 1 3; do
    tag="prompt-${prompt}_L${levels}"
    echo "=== $tag ==="
    python -m dropclip_tpu.tools.run_eval -ds "$DS" --clip-model "$MODEL" \
      --use_obj_prior 1 --visual-prompt "$prompt" --crop-num-levels "$levels" \
      --save-results "results/prompts/${tag}.json" $EXTRA
  done
done
