#!/bin/bash
# HALVA VILA-13B/384 DPA recipe (reference src_vila/halva_vila_13b.sh:
# KL alpha 0.2, lr 2.5e-5, max_len 4096, SigLIP-so400m-384 tower,
# mlp_downsample projector, tune_mm_projector=True -> projector lr =
# base lr).
set -euo pipefail
MODEL_PATH=${MODEL_PATH:-/ckpt/vila-13b-384-orbax}
python -m halva_tpu.train.run \
  --model vila-13b-384 \
  --model-path "$MODEL_PATH" \
  --output-dir "${OUTDIR:-out/halva-vila-13b}" \
  --data-path "${DATA:-data/data.json}" \
  --ref-data-path "${REF_DATA:-data/ref_data.json}" \
  --image-folder "${IMG_DIR:-/data/images}" \
  --epochs 1 --per-device-batch 2 --grad-accum-steps 4 \
  --learning-rate 2.5e-5 --mm-projector-lr 2.5e-5 --loss-alpha 0.2 \
  --lora-r 128 --lora-alpha 256 --warmup-ratio 0.03 \
  --weight-decay 0.0 --max-length 4096 --seed 42 --mesh-model 2
