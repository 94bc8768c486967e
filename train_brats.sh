#!/usr/bin/env bash
set -euo pipefail

# BraTS multi-source training: train on GLI(-PRE), test on SSA + PED under
# domain shift. (The reference's train_brats.sh is a misnamed YAML file —
# reference: SURVEY.md §2.1; this is the working launch script assembled from
# the usage documented in configs/model/unet_multimodal_midfusion.yaml:63-69.)

MODEL="${MODEL:-unet_multimodal_midfusion}"
EPOCHS="${EPOCHS:-200}"
BS="${BS:-2}"
EVAL_BS="${EVAL_BS:-2}"
LR="${LR:-1e-4}"

python main.py \
  task=brats \
  dataset=brats \
  model="${MODEL}" \
  training=default \
  training.epochs="${EPOCHS}" \
  training.batch_size="${BS}" \
  training.eval_batch_size="${EVAL_BS}" \
  training.optimizer=adam \
  training.optimizers.adam.lr="${LR}" \
  training.remat=true \
  "$@"
