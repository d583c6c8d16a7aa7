#!/bin/bash
# HALVA-13B DPA recipe (reference src/hallava_13b.sh: same as 7B with
# KL alpha 0.5). Add --mesh-model 2 for tensor parallelism on small-HBM
# chips.
set -euo pipefail
MODEL_PATH=${MODEL_PATH:-/ckpt/llava-v1.5-13b-orbax}
python -m halva_tpu.train.run \
  --model llava-v1.5-13b \
  --model-path "$MODEL_PATH" \
  --output-dir "${OUTDIR:-out/halva-13b-lora}" \
  --data-path "${DATA:-data/data.json}" \
  --ref-data-path "${REF_DATA:-data/ref_data.json}" \
  --image-folder "${IMG_DIR:-/data/images}" \
  --epochs 1 --per-device-batch 2 --grad-accum-steps 4 \
  --learning-rate 5e-6 --mm-projector-lr 0 --loss-alpha 0.5 \
  --lora-r 128 --lora-alpha 256 --warmup-ratio 0.03 \
  --weight-decay 0.0 --max-length 2048 --seed 42 --mesh-model 2
