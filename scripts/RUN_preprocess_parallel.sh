#!/usr/bin/env bash
# Parallel offline ingest: N worker processes over disjoint scene ranges —
# the launcher equivalent of the reference's multiprocessing.Pool(spawn)
# chunking (reference tools/preprocess_data.py:614-730). Each worker is
# idempotent (done scenes are skipped), so rerunning after a crash resumes.
#
# Usage: RUN_preprocess_parallel.sh RAW_ROOT OUT_DIR N_SCENES [N_PROC] [extra args...]
set -euo pipefail
ROOT=$1; OUT=$2; N=$3; P=${4:-4}; shift; shift; shift; shift || true
CHUNK=$(( (N + P - 1) / P ))
mkdir -p "$OUT"
pids=()
for ((i=0; i<P; i++)); do
  S=$((i * CHUNK)); E=$(( (i + 1) * CHUNK )); [ "$E" -gt "$N" ] && E=$N
  [ "$S" -ge "$E" ] && continue
  python -m dropclip_tpu.tools.preprocess_data -ds Blender -r "$ROOT" \
      -c "$OUT" --start "$S" --end "$E" "$@" \
      > "$OUT/ingest_${S}_${E}.log" 2>&1 &
  pids+=($!)
done
for pid in "${pids[@]}"; do wait "$pid"; done
echo "all $P ingest workers done"
