"""POPE yes/no hallucination probing metric.

Parity: eval_hall_vila/eval_pope.py:6-71. Answers whose first sentence
contains no/not -> "no", else "yes"; positive class = yes.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence


def normalize_answer(text: str) -> str:
    if text.find(".") != -1:
        text = text.split(".")[0]
    text = text.replace(",", "")
    words = text.split(" ")
    if "No" in words or "not" in words or "no" in words:
        return "no"
    return "yes"


def eval_pope(
    answers: Sequence[Dict], labels: Sequence[str]
) -> Dict[str, float]:
    """answers: [{"text": ...}]; labels: "yes"/"no" strings."""
    preds = [
        1 if normalize_answer(a["text"]) == "yes" else 0 for a in answers
    ]
    labs = [0 if l == "no" else 1 for l in labels]
    assert len(preds) == len(labs)

    tp = sum(1 for p, l in zip(preds, labs) if p == 1 and l == 1)
    fp = sum(1 for p, l in zip(preds, labs) if p == 1 and l == 0)
    tn = sum(1 for p, l in zip(preds, labs) if p == 0 and l == 0)
    fn = sum(1 for p, l in zip(preds, labs) if p == 0 and l == 1)

    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    acc = (tp + tn) / max(tp + tn + fp + fn, 1)
    yes_ratio = sum(preds) / max(len(preds), 1)
    return {
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "f1": round(f1, 4),
        "accuracy": round(acc, 4),
        "yes_proportion": round(yes_ratio, 4),
        "TP": tp, "FP": fp, "TN": tn, "FN": fn,
    }


def eval_pope_files(
    result_file: str,
    question_file: str,
    annotation_dir: str,
) -> Dict[str, Dict[str, float]]:
    """Per-category POPE over the official annotation files
    ({ds}_pope_{category}.json with {"label": ...} lines)."""
    questions = {
        q["question_id"]: q
        for q in (json.loads(l) for l in open(question_file))
    }
    answers = [json.loads(l) for l in open(result_file)]
    out = {}
    for fname in sorted(os.listdir(annotation_dir)):
        if "pope" not in fname or not fname.endswith(".json"):
            continue
        category = fname.split("_")[-1][:-5]
        cur = [
            a
            for a in answers
            if questions[a["question_id"]]["category"] == category
        ]
        labels = [
            json.loads(l)["label"]
            for l in open(os.path.join(annotation_dir, fname))
        ]
        out[category] = eval_pope(cur, labels)
    if out:
        out["avg_f1"] = {
            "f1": round(
                sum(v["f1"] for v in out.values()) / len(out), 4
            )
        }
    return out
