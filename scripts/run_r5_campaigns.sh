#!/bin/bash
# Round-5 chip campaign chain. Defense (full fixture, the long pole) first;
# gate N=3 on the adaptable-drift fixture second. Each stage appends to its
# own log; a failure moves on (per-seed artifacts are what BASELINE uses).
set -x
cd /root/repo
mkdir -p outputs/r5

# --- VERDICT #6: defense tables at FULL fixture scale, N=3
for SEED in 0 1 2; do
  timeout 5400 python scripts/validate_stream_tta.py --defenses --seed $SEED \
    --out /root/repo/outputs/r5/defense_full_seed${SEED}.json \
    > outputs/r5/defense_full_seed${SEED}.log 2>&1
done

# --- VERDICT #3: entropy-gate quality at N=3 on a genuinely-adaptable
# --- sustained drift (amp 1.25 fixture, 3 CHUP epochs in the stream)
for SEED in 0 1 2; do
  timeout 3600 python scripts/validate_stream_tta.py --gate \
    --fixture /root/repo/.gate_adapt_fixture --shape 128 128 48 \
    --per-center 8 --epochs 24 --seed $SEED --shift-amp 1.25 \
    --gate-chup-epochs 3 \
    --out /root/repo/outputs/r5/gate_adapt_seed${SEED}.json \
    > outputs/r5/gate_adapt_seed${SEED}.log 2>&1
done
