"""AMBER benchmark metrics (generative + discriminative).

Parity: eval_hall/amber/inference.py (itself from junyangwang0410/AMBER).
Generative: CHAIR / Cover / Hal / Cog over extracted nouns matched against
the AMBER word-association data. Discriminative: Accuracy / Precision /
Recall / F1 overall and per dimension (existence / attribute / relation),
with the reference's exact F1 epsilon (0.001 for existence, 0.0001
elsewhere) so numbers match digit-for-digit.

The reference uses spaCy word-vector similarity for near-synonym matching
(inference.py:40-44); spaCy is optional here — `synonym_fn` is pluggable
and defaults to spaCy when importable, else exact match only (documented
degradation: slightly stricter CHAIR/Cover).
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Sequence

from halva_tpu.evals.lemmatize import extract_nouns

SynFn = Callable[[str, str], bool]


def synonym_fn_from_table(table: Dict[str, List[str]]) -> SynFn:
    """Precomputed synonym pairs -> SynFn. Format: {word: [synonyms]}
    (symmetric closure taken here). This is how spaCy-parity is restored
    in a no-network environment: run scripts/build_amber_synonyms.py
    once on a machine with spacy/en_core_web_lg, ship the JSON, point
    HALVA_AMBER_SYNONYMS at it. The table only needs the AMBER
    hallucination vocabulary (~1k nouns), so it is a few hundred KB."""
    pairs = set()
    for w, syns in table.items():
        for s in syns:
            pairs.add((w, s))
            pairs.add((s, w))

    def fn(w1: str, w2: str) -> bool:
        return (w1, w2) in pairs

    return fn


def load_synonym_table(path: str) -> SynFn:
    with open(path, encoding="utf-8") as f:
        return synonym_fn_from_table(json.load(f))


def make_synonym_fn(similarity_score: float = 0.8) -> SynFn:
    """Resolution order: HALVA_AMBER_SYNONYMS table file > live spaCy
    word vectors (the reference's method, amber/inference.py:40-44) >
    exact-match-only fallback. The fallback's metric drift is bounded by
    tests/test_eval_metrics.py::test_amber_synonym_fallback_delta."""
    import os

    table_path = os.environ.get("HALVA_AMBER_SYNONYMS")
    if table_path and os.path.exists(table_path):
        return load_synonym_table(table_path)
    try:
        import spacy

        nlp = spacy.load("en_core_web_lg")

        def fn(w1: str, w2: str) -> bool:
            return nlp(w1).similarity(nlp(w2)) > similarity_score

        return fn
    except Exception:
        return lambda w1, w2: False  # exact-match-only fallback


_DIM = {
    "discriminative-hallucination": "existence",
    "discriminative-attribute-state": "state",
    "discriminative-attribute-number": "number",
    "discriminative-attribute-action": "action",
    "relation": "relation",
}


def _dim_of(gt_type: str) -> str:
    return _DIM.get(gt_type, "relation")


class _Counter:
    def __init__(self):
        self.correct_score = 0
        self.correct_num = 0
        self.no_score = 0
        self.no_num = 0
        self.ans_no_score = 0
        self.ans_no_num = 0

    def update(self, truth: str, response: str):
        self.correct_num += 1
        if truth == "yes":
            if response == "Yes":
                self.correct_score += 1
        else:
            self.no_num += 1
            if response == "No":
                self.correct_score += 1
                self.no_score += 1
        if response == "No":
            self.ans_no_num += 1
            if truth == "no":
                self.ans_no_score += 1

    def metrics(self, f1_eps: float = 0.0001) -> Dict[str, float]:
        acc = round(self.correct_score / max(self.correct_num, 1) * 100, 1)
        prec = round(self.ans_no_score / max(self.ans_no_num, 1) * 100, 1)
        rec = round(self.no_score / max(self.no_num, 1) * 100, 1)
        f1 = round(
            2 * (prec / 100) * (rec / 100)
            / ((prec / 100) + (rec / 100) + f1_eps)
            * 100,
            1,
        )
        return {
            "accuracy": acc, "precision": prec, "recall": rec, "f1": f1
        }


def normalize_discriminative_response(text: str) -> str:
    """Map raw generation to the "Yes"/"No" labels the metric compares
    against (official AMBER pipeline preprocesses responses likewise)."""
    first = text.strip().split()
    if not first:
        return ""
    w = first[0].strip(".,!").lower()
    if w == "yes":
        return "Yes"
    if w == "no":
        return "No"
    return text.strip()


class AmberEvaluator:
    def __init__(
        self,
        annotations: List[dict],  # data/annotations.json
        word_association: Dict[str, List[str]],  # data/relation.json
        safe_words: Sequence[str],  # data/safe_words.txt lines
        synonym_fn: Optional[SynFn] = None,
    ):
        self.gt = annotations
        self.assoc = word_association
        self.global_safe = set(safe_words)
        self.syn = synonym_fn or make_synonym_fn()
        self.hallucination_words = set()
        for w1, ws in word_association.items():
            self.hallucination_words.add(w1)
            self.hallucination_words.update(ws)

    @classmethod
    def from_files(
        cls,
        annotation_path: str,
        word_association_path: str,
        safe_words_path: str,
        synonym_fn: Optional[SynFn] = None,
    ) -> "AmberEvaluator":
        with open(annotation_path, encoding="utf-8") as f:
            gt = json.load(f)
        with open(word_association_path, encoding="utf-8") as f:
            assoc = json.load(f)
        with open(safe_words_path, encoding="utf-8") as f:
            safe = [l.rstrip("\n") for l in f]
        return cls(gt, assoc, safe, synonym_fn)

    # ---- generative -------------------------------------------------
    def _eval_generative(self, gt: dict, response: str, m: Dict):
        nouns = [
            n
            for n in extract_nouns(response, vocab=self.hallucination_words)
            if n in self.hallucination_words
        ]
        truth: List[str] = gt["truth"]
        hallu: List[str] = gt["hallu"]
        safe_pairs = [
            (syn, idx)
            for idx, w in enumerate(truth)
            for syn in self.assoc.get(w, [])
        ] + [(w, idx) for idx, w in enumerate(truth)]
        ha_pairs = [
            (syn, idx)
            for idx, w in enumerate(hallu)
            for syn in self.assoc.get(w, [])
        ] + [(w, idx) for idx, w in enumerate(hallu)]

        cover = [0] * len(truth)
        ha_cover = [0] * len(hallu)
        n_hall = 0
        for noun in nouns:
            if noun in self.global_safe:
                continue
            hit_safe = next(
                (i for w, i in safe_pairs if w == noun), None
            )
            if hit_safe is not None:
                cover[hit_safe] = 1
                continue
            hit_ha = next((i for w, i in ha_pairs if w == noun), None)
            if hit_ha is not None:
                ha_cover[hit_ha] = 1
            else:
                for w, i in ha_pairs:
                    if self.syn(noun, w):
                        ha_cover[i] = 1
                        break
            syn_safe = next(
                (i for w, i in safe_pairs if self.syn(noun, w)), None
            )
            if syn_safe is not None:
                cover[syn_safe] = 1
                continue
            n_hall += 1

        m["chair_score"] += n_hall
        m["chair_num"] += len(nouns)
        m["cover_score"] += sum(cover)
        m["cover_num"] += len(truth)
        m["ha_cover_score"] += sum(ha_cover)
        m["ha_cover_num"] += len(hallu)
        m["non_hallu_score"] += int(n_hall == 0)
        m["non_hallu_num"] += 1

    # ---- entry ------------------------------------------------------
    def evaluate(
        self,
        responses: Sequence[dict],  # [{"id": int, "response": str}]
        evaluation_type: str = "a",  # a | g | d | de | da | dr
        normalize_responses: bool = False,
    ) -> Dict[str, Dict[str, float]]:
        gen = {
            "chair_score": 0, "chair_num": 0,
            "cover_score": 0, "cover_num": 0,
            "ha_cover_score": 0, "ha_cover_num": 0,
            "non_hallu_score": 0, "non_hallu_num": 0,
        }
        counters = {
            k: _Counter()
            for k in (
                "overall", "existence", "state", "number", "action",
                "relation",
            )
        }
        for row in responses:
            gt = self.gt[row["id"] - 1]
            if gt["type"] == "generative":
                if evaluation_type in ("a", "g"):
                    self._eval_generative(gt, row["response"], gen)
                continue
            if evaluation_type == "g":
                continue
            resp = row["response"]
            if normalize_responses:
                resp = normalize_discriminative_response(resp)
            dim = _dim_of(gt["type"])
            counters["overall"].update(gt["truth"], resp)
            counters[dim].update(gt["truth"], resp)

        out: Dict[str, Dict[str, float]] = {}
        if evaluation_type in ("a", "g") and gen["non_hallu_num"]:
            out["generative"] = {
                "CHAIR": round(
                    gen["chair_score"] / max(gen["chair_num"], 1) * 100, 1
                ),
                "Cover": round(
                    gen["cover_score"] / max(gen["cover_num"], 1) * 100, 1
                ),
                "Hal": round(
                    100
                    - gen["non_hallu_score"]
                    / max(gen["non_hallu_num"], 1)
                    * 100,
                    1,
                ),
                "Cog": round(
                    gen["ha_cover_score"]
                    / max(gen["ha_cover_num"], 1)
                    * 100,
                    1,
                ),
            }
        if evaluation_type in ("a", "d", "de", "da", "dr"):
            if counters["overall"].correct_num:
                out["discriminative"] = counters["overall"].metrics()
            if counters["existence"].correct_num:
                out["existence"] = counters["existence"].metrics(
                    f1_eps=0.001
                )
            attr = _Counter()
            for k in ("state", "number", "action"):
                c = counters[k]
                attr.correct_score += c.correct_score
                attr.correct_num += c.correct_num
                attr.no_score += c.no_score
                attr.no_num += c.no_num
                attr.ans_no_score += c.ans_no_score
                attr.ans_no_num += c.ans_no_num
                if c.correct_num:
                    out[k] = c.metrics()
            if attr.correct_num:
                out["attribute"] = attr.metrics()
            if counters["relation"].correct_num:
                out["relation"] = counters["relation"].metrics()
        return out
