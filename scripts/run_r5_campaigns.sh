#!/bin/bash
# Round-5 chip campaign chain (run AFTER the SAR/CoTTA sweeps release the
# chip). Each stage appends to its own log; stages are independent — a
# failure moves on to the next (the driver's per-stage artifacts are what
# BASELINE consumes).
set -x
cd /root/repo
mkdir -p outputs/r5

# --- VERDICT #3: entropy-gate quality at N=3 on the strongly-adaptable
# --- stream (.gate_strong_fixture, shift-amp 1.75)
for SEED in 0 1 2; do
  timeout 3600 python scripts/validate_stream_tta.py --gate \
    --fixture /root/repo/.gate_strong_fixture --shape 128 128 48 \
    --per-center 8 --epochs 24 --seed $SEED \
    --out outputs/r5/gate_strong_seed${SEED}.json \
    > outputs/r5/gate_strong_seed${SEED}.log 2>&1
done

# --- VERDICT #6: defense tables at FULL fixture scale, N=3
for SEED in 0 1 2; do
  timeout 5400 python scripts/validate_stream_tta.py --defenses --seed $SEED \
    --out outputs/r5/defense_full_seed${SEED}.json \
    > outputs/r5/defense_full_seed${SEED}.log 2>&1
done
