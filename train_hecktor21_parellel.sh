#!/usr/bin/env bash
set -euo pipefail

# Parallel leave-one-center-out sweep.
#
# Reference analogue: a bash GPU-pool scheduler pinning one training job per
# free GPU (reference: train_hecktor21_parellel.sh:33-172). On TPU the
# accelerator is owned by one process per slice, so the pool is a pool of
# SLICES: list slice specifications (device-index lists) in DEVICE_POOL and
# one sweep job runs per free slice, pinned via training.devices=[...].
# With a single-chip pool this degrades gracefully to the sequential sweep.
# (Filename kept, typo included, for reference-script compatibility.)

TARGET_CENTERS=("CHUS" "CHUM" "CHGJ" "CHMR" "CHUP")
RUN_PREFIX="hecktor21_unet"

EPOCHS=300
BS=8
EVAL_BS=16
NUM_WORKERS=8
OPT="adam"
LR="5e-3"

# One entry per concurrently-usable device group, e.g. ("[0,1,2,3]" "[4,5,6,7]")
DEVICE_POOL=("${DEVICE_POOL[@]:-[0]}")

declare -A SLICE_PID
PIDS=()

cleanup() {
  echo "[cleanup] terminating child jobs..."
  for pid in "${PIDS[@]:-}"; do
    kill "$pid" 2>/dev/null || true
  done
  wait 2>/dev/null || true
}
trap cleanup INT TERM EXIT

start_job() {
  local target="$1" devices="$2"
  local run_name="${RUN_PREFIX}_target-${target}"
  echo "[launch] target=${target} devices=${devices}"
  python main.py \
    task=hecktor21 \
    task.run_name="${run_name}" \
    dataset=hecktor21 \
    dataset.target_center="${target}" \
    model=unet \
    training=default \
    training.epochs="${EPOCHS}" \
    training.batch_size="${BS}" \
    training.eval_batch_size="${EVAL_BS}" \
    training.num_workers="${NUM_WORKERS}" \
    training.devices="${devices}" \
    training.optimizer="${OPT}" \
    training.optimizers.adam.lr="${LR}" \
    > "run_${run_name}.log" 2>&1 &
  local pid=$!
  SLICE_PID["$devices"]=$pid
  PIDS+=("$pid")
}

free_slice() {
  # echo the first pool slice with no live job, else empty
  for devices in "${DEVICE_POOL[@]}"; do
    local pid="${SLICE_PID[$devices]:-}"
    if [[ -z "$pid" ]] || ! kill -0 "$pid" 2>/dev/null; then
      echo "$devices"
      return 0
    fi
  done
  echo ""
}

for target in "${TARGET_CENTERS[@]}"; do
  while true; do
    slice="$(free_slice)"
    if [[ -n "$slice" ]]; then
      start_job "$target" "$slice"
      break
    fi
    sleep 5
  done
done

wait
trap - INT TERM EXIT
echo "[done] all sweep jobs finished."
