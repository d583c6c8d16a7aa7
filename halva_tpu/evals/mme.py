"""MME benchmark: answer conversion + scoring.

The reference only converts answers to the official eval_tool format
(src/evaluate_hall/convert_answer_to_mme.py) and defers scoring to MME's
released calculation script; here both live in-repo. MME scoring per the
official tool: per category, acc = per-question accuracy, acc+ = fraction
of images with BOTH questions right; category score = 100*(acc + acc+).
MME-Hall (README.md:127) = existence + count + position + color.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

HALL_CATEGORIES = ("existence", "count", "position", "color")


def load_mme_ground_truth(data_path: str) -> Dict[Tuple[str, str, str], str]:
    """(category, file, question) -> yes/no from the MME release layout."""
    gt: Dict[Tuple[str, str, str], str] = {}
    for category in os.listdir(data_path):
        cdir = os.path.join(data_path, category)
        if not os.path.isdir(cdir):
            continue
        qa = (
            os.path.join(cdir, "questions_answers_YN")
            if os.path.exists(os.path.join(cdir, "images"))
            else cdir
        )
        for fname in os.listdir(qa):
            if not fname.endswith(".txt"):
                continue
            for line in open(os.path.join(qa, fname)):
                parts = line.strip().split("\t")
                if len(parts) >= 2:
                    gt[(category, fname, parts[0])] = parts[1]
    return gt


def convert_answers(
    answers: Sequence[dict],
    gt: Dict[Tuple[str, str, str], str],
) -> Dict[str, List[Tuple[str, str, str, str]]]:
    """answers jsonl rows -> per-category (file, question, gt, pred) tuples
    (reference convert_answer_to_mme.py:56-74 prompt normalization)."""
    out: Dict[str, List[Tuple[str, str, str, str]]] = defaultdict(list)
    for a in answers:
        category = a["question_id"].split("/")[0]
        fname = a["question_id"].split("/")[-1].split(".")[0] + ".txt"
        prompt = a["prompt"]
        prompt = prompt.replace(
            "Answer the question using a single word or phrase.", ""
        ).strip()
        if "Please answer yes or no." not in prompt:
            prompt = prompt + " Please answer yes or no."
            if (category, fname, prompt) not in gt:
                prompt = prompt.replace(
                    " Please answer yes or no.", "  Please answer yes or no."
                )
        out[category].append(
            (fname, prompt, gt[(category, fname, prompt)], a["text"])
        )
    return out


def _parse_pred(text: str) -> str:
    t = text.strip().lower()
    first = t.split(".")[0].split(",")[0].strip()
    if first.startswith("yes"):
        return "yes"
    if first.startswith("no"):
        return "no"
    return "other"


def score_category(
    rows: Sequence[Tuple[str, str, str, str]]
) -> Dict[str, float]:
    """Official MME scoring: acc, acc+ and score = 100*(acc+acc+)."""
    per_img: Dict[str, List[bool]] = defaultdict(list)
    correct = 0
    for fname, _, gt_ans, pred in rows:
        ok = _parse_pred(pred) == gt_ans.strip().lower()
        correct += int(ok)
        per_img[fname].append(ok)
    acc = correct / max(len(rows), 1)
    acc_plus = sum(1 for v in per_img.values() if all(v) and len(v) == 2)
    acc_plus /= max(len(per_img), 1)
    return {
        "acc": acc,
        "acc_plus": acc_plus,
        "score": 100.0 * (acc + acc_plus),
    }


def score_mme(
    answers: Sequence[dict], data_path: str
) -> Dict[str, Dict[str, float]]:
    gt = load_mme_ground_truth(data_path)
    per_cat = convert_answers(answers, gt)
    out = {c: score_category(rows) for c, rows in per_cat.items()}
    hall = [out[c]["score"] for c in HALL_CATEGORIES if c in out]
    if hall:
        out["mme_hall_total"] = {"score": sum(hall)}
    return out
