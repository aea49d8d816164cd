#!/usr/bin/env bash
# Parallel offline ingest: N worker processes over disjoint scene ranges —
# the launcher equivalent of the reference's multiprocessing.Pool(spawn)
# chunking (reference tools/preprocess_data.py:614-730). Each worker is
# idempotent (done scenes are skipped), so rerunning after a crash resumes.
#
# Scenes are independent, so multi-CHIP ingest on a TPU pod host is this
# same launcher with one worker per chip: PIN_CHIPS=1 gives each worker
# exclusive ownership of one local chip via the standard libtpu
# single-chip-per-process env (each process sees exactly one device;
# throughput = N_PROC x the single-chip scenes/sec, BASELINE_DERIVATION.md).
# Not verifiable on this image's single tunneled chip — the env block is
# the documented libtpu recipe, inert unless PIN_CHIPS=1.
#
# Usage: [PIN_CHIPS=1] RUN_preprocess_parallel.sh RAW_ROOT OUT_DIR N_SCENES [N_PROC] [extra args...]
set -euo pipefail
ROOT=$1; OUT=$2; N=$3; P=${4:-4}; shift; shift; shift; shift || true
CHUNK=$(( (N + P - 1) / P ))
mkdir -p "$OUT"
pids=()
for ((i=0; i<P; i++)); do
  S=$((i * CHUNK)); E=$(( (i + 1) * CHUNK )); [ "$E" -gt "$N" ] && E=$N
  [ "$S" -ge "$E" ] && continue
  PIN_ENV=()
  if [ "${PIN_CHIPS:-0}" = "1" ]; then
    PIN_ENV=(TPU_VISIBLE_DEVICES="$i"
             TPU_PROCESS_BOUNDS=1,1,1
             TPU_CHIPS_PER_PROCESS_BOUNDS=1,1,1
             TPU_MESH_CONTROLLER_ADDRESS="localhost:$((8476 + i))"
             TPU_MESH_CONTROLLER_PORT="$((8476 + i))")
  fi
  env ${PIN_ENV[@]+"${PIN_ENV[@]}"} \
  python -m dropclip_tpu.tools.preprocess_data -ds Blender -r "$ROOT" \
      -c "$OUT" --start "$S" --end "$E" "$@" \
      > "$OUT/ingest_${S}_${E}.log" 2>&1 &
  pids+=($!)
done
for pid in ${pids[@]+"${pids[@]}"}; do wait "$pid"; done
echo "all $P ingest workers done"
