"""HallusionBench: GPT-judged correctness + accuracy statistics.

Parity: eval_hall/hallusion_bench/utils.py (judge prompt :19-75, per-figure
:137-170, per-question :172-210, per-pair :212-345, easy/hard :347-410)
and random_guess.py:190-238 reporting. Reported numbers:
  qAcc  — per question-pair all-correct accuracy,
  fAcc  — per figure all-correct accuracy,
  aAcc  — per individual question accuracy,
  easy/hard — pair accuracy on figure_id==0 (easy) vs modified (hard).

The judge is pluggable (judge_fn: prompt -> text); `judge_correctness`
maps its verdicts to {1 correct, 0 incorrect, 2 unclear} like the
reference (:58-66). With gt_answer-based exact matching available as an
offline fallback.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List, Sequence

JUDGE_PROMPT = (
    "Imagine you are an intelligent teacher. Thoroughly read the "
    "question, reference answer and the prediction answer to ensure a "
    "clear understanding of the information provided. Assess the "
    "correctness of the predictions. If the prediction answer does not "
    "conflict with the reference answer, please generate “correct”. If "
    "the prediction answer conflict with the reference answer, please "
    "generate “incorrect”. If the prediction answer is unclear about the "
    "answer, please generate \"unclear\". \n\n Question:"
)


def build_judge_prompt(row: Dict) -> str:
    return (
        JUDGE_PROMPT
        + row["question"]
        + "\nReference answer: "
        + row["gt_answer_details"]
        + "\nPrediction answer:"
        + row["model_prediction"]
        + "\nOutput:"
    )


def parse_judge_output(output_text: str) -> int:
    """{0: incorrect, 1: correct, 2: unclear} (reference :58-66)."""
    low = output_text.lower()
    if "incorrect" in low:
        return 0
    if "correct" in low:
        return 1
    return 2


def judge_correctness(
    data: Sequence[Dict],
    judge_fn: Callable[[str], str],
    output_entry: str = "model_prediction",
    correctness_entry: str = "gpt4v_output_gpt_check",
) -> List[Dict]:
    out = []
    for row in data:
        row = dict(row)
        verdict = parse_judge_output(judge_fn(build_judge_prompt(row)))
        row[correctness_entry] = verdict
        # "correct" means agreeing with the human answer: gt_answer
        # encodes which side is correct
        row["correct"] = int(
            verdict == 1
        )
        out.append(row)
    return out


def exact_match_correctness(
    data: Sequence[Dict], output_entry: str = "model_prediction"
) -> List[Dict]:
    """Offline fallback: yes/no parse vs gt_answer (1=yes, 0=no)."""
    out = []
    for row in data:
        row = dict(row)
        text = row[output_entry].strip().lower()
        first = text.split(".")[0]
        pred = (
            "1"
            if ("yes" in first.split() and "no" not in first.split())
            else "0"
        )
        row["correct"] = int(pred == str(row["gt_answer"]))
        out.append(row)
    return out


def _pair_key(r: Dict) -> str:
    return "_".join(
        [
            r["category"],
            r["subcategory"],
            str(r["set_id"]),
            str(r["question_id"]),
        ]
    )


def _fig_key(r: Dict) -> str:
    return "_".join(
        [
            r["category"],
            r["subcategory"],
            str(r["set_id"]),
            str(r["figure_id"]),
        ]
    )


def _all_correct_acc(groups: Dict[str, List[int]]) -> Dict[str, float]:
    total = len(groups)
    correct = sum(1 for v in groups.values() if all(v))
    wrong = sum(1 for v in groups.values() if not any(v))
    return {
        "total": total,
        "correct": correct,
        "wrong": wrong,
        "inconsistent": total - correct - wrong,
        "acc": correct / max(total, 1),
    }


def evaluate(data: Sequence[Dict]) -> Dict[str, Dict]:
    """Compute qAcc/fAcc/aAcc + easy/hard pair accuracy.

    `data` rows need: category (VD/VS), subcategory, set_id, figure_id,
    question_id, visual_input (VS), correct (0/1).
    """
    # per figure (skip VS rows without figure)
    figs: Dict[str, List[int]] = defaultdict(list)
    for r in data:
        if r["category"] == "VS" and str(r["figure_id"]) == "0":
            continue
        figs[_fig_key(r)].append(int(r["correct"]))

    pairs: Dict[str, List[int]] = defaultdict(list)
    easy: Dict[str, List[int]] = defaultdict(list)
    hard: Dict[str, List[int]] = defaultdict(list)
    for r in data:
        k = _pair_key(r)
        pairs[k].append(int(r["correct"]))
        if str(r["figure_id"]) == "0":
            easy[k].append(int(r["correct"]))
        else:
            hard[k].append(int(r["correct"]))

    n = len(data)
    n_correct = sum(int(r["correct"]) for r in data)

    return {
        "qAcc": _all_correct_acc(pairs),
        "fAcc": _all_correct_acc(figs),
        "aAcc": {
            "total": n,
            "correct": n_correct,
            "acc": n_correct / max(n, 1),
        },
        "easy": _all_correct_acc(easy),
        "hard": _all_correct_acc(hard),
    }
