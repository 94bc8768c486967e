#!/bin/bash
# Round-5 remaining measurements (run after the campaign chain).
set -x
cd /root/repo
mkdir -p outputs/r5

# VERDICT #5 (rate): midfusion windowed serving vs the HBM wall
timeout 2400 python scripts/bench_midfusion_window.py --iters 8 \
  > outputs/r5/midfusion_window.jsonl 2> outputs/r5/midfusion_window.err

# SAR serving economics (rate alongside the quality tables)
timeout 1200 env BENCH_TTA_METHOD=sar python scripts/bench_model.py \
  --skip-forward --iters 8 \
  > outputs/r5/sar_rate.jsonl 2> outputs/r5/sar_rate.err

# VERDICT #7: loader-saturation run (decode_only / device_only / pipelined)
timeout 1800 python scripts/validate_loader_saturation.py --workers 2 \
  > outputs/r5/loader_saturation.jsonl 2> outputs/r5/loader_saturation.err

# VERDICT #5 (quality): BraTS midfusion windowed-adaptation arms
timeout 4500 python scripts/validate_tta_brats.py --window \
  --steps-list 4 --lrs 1e-2 --focus-list uncertain \
  --out /root/repo/outputs/r5/brats_window.json \
  > outputs/r5/brats_window.log 2>&1
