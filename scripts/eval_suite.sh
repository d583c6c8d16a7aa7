#!/bin/bash
# Full hallucination eval suite (the reference's
# src_vila/evaluate_hall_vila/eval_hall_suite.sh): CHAIR, POPE, AMBER,
# MME over one loaded model. GPT-judge benchmarks (MMHal/HallusionBench)
# run when OPENAI_API_KEY is set.
set -euo pipefail
MODEL_PATH=${MODEL_PATH:?path to adapter or full checkpoint}
MODEL_BASE=${MODEL_BASE:-}
OUT=${OUT:-out/eval}
COMMON=(--model-path "$MODEL_PATH" ${MODEL_BASE:+--model-base "$MODEL_BASE"} --batch-size 8)

python -m halva_tpu.evals.cli chair "${COMMON[@]}" \
  --image-folder "${COCO_VAL2014:?}" --coco-path "${COCO_ANN:?}" \
  --chair-cache "$OUT/chair.pkl" --answers-file "$OUT/chair.jsonl"

python -m halva_tpu.evals.cli pope "${COMMON[@]}" \
  --question-file "${POPE_QUESTIONS:?}" --image-folder "${COCO_VAL2014:?}" \
  --annotation-dir "${POPE_ANN:?}" --answers-file "$OUT/pope.jsonl" \
  --max-new-tokens 64

python -m halva_tpu.evals.cli amber "${COMMON[@]}" \
  --query-file "${AMBER_QUERY:?}" --image-folder "${AMBER_IMAGES:?}" \
  --anno-dir "${AMBER_ANNO:?}" --answers-file "$OUT/amber.jsonl"

python -m halva_tpu.evals.cli mme "${COMMON[@]}" \
  --question-file "${MME_QUESTIONS:?}" --image-folder "${MME_IMAGES:?}" \
  --mme-data "${MME_DATA:?}" --answers-file "$OUT/mme.jsonl" \
  --max-new-tokens 64
