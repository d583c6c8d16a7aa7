#!/bin/bash
# HALVA-7B DPA fine-tune on a TPU slice — the published recipe of the
# reference's src/hallava_7b.sh (1 epoch, lr 5e-6 cosine, warmup 3%,
# KL alpha 0.4, LoRA r=128/alpha=256, bf16, max_len 2048, effective
# global batch 64 = 4/device-group x grad-acc 4 x data-parallel 4; on a
# v5e-8 we keep global batch 64 as 8 x 2 x 4).
set -euo pipefail

MODEL_PATH=${MODEL_PATH:-/ckpt/llava-v1.5-7b-orbax}
DATA=${DATA:-data/data.json}
REF_DATA=${REF_DATA:-data/ref_data.json}
IMG_DIR=${IMG_DIR:-/data/images}
OUTDIR=${OUTDIR:-out/halva-7b-lora}

python -m halva_tpu.train.run \
  --model llava-v1.5-7b \
  --model-path "$MODEL_PATH" \
  --output-dir "$OUTDIR" \
  --data-path "$DATA" \
  --ref-data-path "$REF_DATA" \
  --image-folder "$IMG_DIR" \
  --epochs 1 \
  --per-device-batch 2 \
  --grad-accum-steps 4 \
  --learning-rate 5e-6 \
  --mm-projector-lr 0 \
  --loss-alpha 0.4 \
  --lora-r 128 \
  --lora-alpha 256 \
  --warmup-ratio 0.03 \
  --weight-decay 0.0 \
  --max-length 2048 \
  --seed 42
