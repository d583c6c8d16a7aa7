"""Metric computers: hand-computed golden values."""

import json

import numpy as np
import pytest

from halva_tpu.evals import amber, chair, hallusion, mme, mmhal, pope
from halva_tpu.evals.lemmatize import singularize


def test_singularize():
    assert singularize("dogs") == "dog"
    assert singularize("benches") == "bench"
    assert singularize("women") == "woman"
    assert singularize("bus") == "bus"
    assert singularize("skis") == "skis"


def test_chair_basic():
    ev = chair.ChairEvaluator(
        {1: {"dog", "frisbee"}, 2: {"cat"}}
    )
    out = ev.compute(
        [
            "A dog catching a frisbee.",  # no hallucination
            "A cat and a dog playing.",  # dog hallucinated for image 2
        ],
        [1, 2],
    )
    m = out["overall_metrics"]
    assert m["CHAIRs"] == 0.5  # 1 of 2 captions hallucinate
    # mentions: dog, frisbee (img1), cat, dog (img2) -> 1 of 4 hallucinated
    assert m["CHAIRi"] == 0.25
    # recalled: dog+frisbee of {dog,frisbee}; cat of {cat} -> 3/3
    assert m["Recall"] == 1.0


def test_chair_synonyms_and_double_words():
    ev = chair.ChairEvaluator({7: {"dog"}})
    out = ev.compute(["A puppy with a hot dog."], [7])
    s = out["sentences"][0]
    # puppy -> dog (recalled); "hot dog" (double word) -> hallucinated
    assert ("hot dog", "hot dog") in [
        tuple(x) for x in s["mscoco_hallucinated_words"]
    ]
    assert s["metrics"]["Recall"] == 1.0


def test_chair_baby_animal_qualifier():
    ev = chair.ChairEvaluator({3: {"bird"}})
    out = ev.compute(["A baby bird in a nest."], [3])
    # "baby bird" folds to "bird", no person/baby false fire
    assert out["overall_metrics"]["CHAIRs"] == 0.0


def test_pope():
    answers = [
        {"text": "Yes, there is."},
        {"text": "No, the image does not."},
        {"text": "There is not a dog."},
        {"text": "Yes."},
    ]
    labels = ["yes", "no", "yes", "no"]
    m = pope.eval_pope(answers, labels)
    assert m["TP"] == 1 and m["TN"] == 1 and m["FP"] == 1 and m["FN"] == 1
    assert m["accuracy"] == 0.5
    assert m["yes_proportion"] == 0.5


def test_amber_generative_and_discriminative():
    gt = [
        {
            "type": "generative",
            "truth": ["dog", "frisbee"],
            "hallu": ["cat"],
        },
        {"type": "discriminative-hallucination", "truth": "yes"},
        {"type": "discriminative-hallucination", "truth": "no"},
        {"type": "discriminative-attribute-state", "truth": "no"},
    ]
    assoc = {"dog": ["puppy"], "frisbee": [], "cat": ["kitten"]}
    ev = amber.AmberEvaluator(
        gt, assoc, safe_words=["image"], synonym_fn=lambda a, b: False
    )
    responses = [
        {"id": 1, "response": "A puppy catches a frisbee near a zebra."},
        {"id": 2, "response": "Yes"},
        {"id": 3, "response": "Yes"},
        {"id": 4, "response": "No"},
    ]
    out = ev.evaluate(responses)
    g = out["generative"]
    # nouns in vocab: puppy (safe syn of dog), frisbee (safe), cat? zebra
    # not in assoc vocab -> filtered. CHAIR = 0/2 hallucinated
    assert g["CHAIR"] == 0.0
    assert g["Cover"] == 100.0  # dog + frisbee both covered
    assert g["Hal"] == 0.0
    d = out["discriminative"]
    # responses: Yes(gt yes)=correct, Yes(gt no)=wrong, No(gt no)=correct
    assert d["accuracy"] == round(2 / 3 * 100, 1)
    ex = out["existence"]
    assert ex["accuracy"] == 50.0


def test_amber_hallucinated_noun():
    gt = [{"type": "generative", "truth": ["dog"], "hallu": ["cat"]}]
    assoc = {"dog": [], "cat": []}
    ev = amber.AmberEvaluator(gt, assoc, [], synonym_fn=lambda a, b: False)
    out = ev.evaluate(
        [{"id": 1, "response": "A cat sits here."}]
    )
    g = out["generative"]
    assert g["CHAIR"] == 100.0  # "cat" is neither safe nor globally safe
    assert g["Cog"] == 100.0  # it covers the hallu list
    assert g["Hal"] == 100.0


def test_amber_synonym_fallback_delta():
    """Quantifies what the exact-match fallback costs vs word-vector
    synonym matching (reference amber/inference.py:40-44), and proves an
    injected precomputed table (HALVA_AMBER_SYNONYMS format,
    scripts/build_amber_synonyms.py) restores the synonym numbers.

    Fixture: the response says "hound"; "hound" is in the hallucination
    vocabulary but NOT in assoc["dog"], so only word-vector similarity
    can map it to the truth word "dog".

    Documented delta on this fixture (worst case: every noun needs
    synonym matching): exact fallback scores CHAIR 50 / Cover 50 /
    Hal 100 where synonym matching scores CHAIR 0 / Cover 100 / Hal 0.
    Real CHAIR-style responses overwhelmingly use assoc-listed surface
    forms, so production drift is far smaller — but nonzero, hence the
    injectable table."""
    gt = [{"type": "generative", "truth": ["dog", "frisbee"], "hallu": []}]
    # "hound" must be in the vocab (via some assoc entry) to survive the
    # noun filter, but not in dog's own association list
    assoc = {"dog": ["puppy"], "frisbee": [], "hound": []}
    responses = [{"id": 1, "response": "A hound chases a frisbee."}]

    exact = amber.AmberEvaluator(
        gt, assoc, [], synonym_fn=lambda a, b: False
    ).evaluate(responses)["generative"]
    assert exact["CHAIR"] == 50.0  # hound counted hallucinated
    assert exact["Cover"] == 50.0  # dog uncovered
    assert exact["Hal"] == 100.0

    table_fn = amber.synonym_fn_from_table({"dog": ["hound"]})
    syn = amber.AmberEvaluator(
        gt, assoc, [], synonym_fn=table_fn
    ).evaluate(responses)["generative"]
    assert syn["CHAIR"] == 0.0
    assert syn["Cover"] == 100.0
    assert syn["Hal"] == 0.0


def test_amber_synonym_table_env(tmp_path, monkeypatch):
    """make_synonym_fn picks up HALVA_AMBER_SYNONYMS (and the table is
    symmetric)."""
    import json as _json

    p = tmp_path / "syn.json"
    p.write_text(_json.dumps({"dog": ["hound"]}))
    monkeypatch.setenv("HALVA_AMBER_SYNONYMS", str(p))
    fn = amber.make_synonym_fn()
    assert fn("dog", "hound") and fn("hound", "dog")
    assert not fn("dog", "cat")


def test_mme_scoring():
    rows = [
        ("a.txt", "q1", "Yes", "Yes, it is."),
        ("a.txt", "q2", "No", "No."),
        ("b.txt", "q1", "Yes", "No"),
        ("b.txt", "q2", "No", "No"),
    ]
    m = mme.score_category(rows)
    assert m["acc"] == 0.75
    assert m["acc_plus"] == 0.5  # only a.txt has both right
    assert m["score"] == 125.0


def test_mmhal_summarize():
    responses = [
        "Explanation...\n- Rating: 6, great" if i % 2 == 0
        else "Rating: 1, bad"
        for i in range(16)
    ]
    s = mmhal.summarize(responses)
    assert s["average_score"] == 3.5
    assert s["hallucination_rate"] == 0.5
    assert abs(s["scores_per_type"]["attribute"] - 6.0) < 1e-9


def test_mmhal_parse_rating_ambiguous():
    assert mmhal.parse_rating("Rating: 3 maybe rating: 5") == 0
    assert mmhal.parse_rating("no rating present") == 0
    assert mmhal.parse_rating("Rating: 4") == 4


def test_hallusion_stats():
    def row(cat, sub, set_id, fig, q, correct, vi="1"):
        return {
            "category": cat, "subcategory": sub, "set_id": set_id,
            "figure_id": fig, "question_id": q, "visual_input": vi,
            "correct": correct,
        }

    data = [
        row("VD", "s", 0, 0, 0, 1),
        row("VD", "s", 0, 1, 0, 1),  # pair (VD,s,0,q0) both right
        row("VD", "s", 0, 0, 1, 1),
        row("VD", "s", 0, 1, 1, 0),  # pair q1 mixed
        row("VS", "t", 0, 0, 0, 0, vi="0"),  # no-figure VS row
    ]
    out = hallusion.evaluate(data)
    assert out["aAcc"]["acc"] == 3 / 5
    assert out["qAcc"]["total"] == 3  # (VD q0), (VD q1), (VS q0)
    assert out["qAcc"]["correct"] == 1
    # figures: VD fig0 (q0,q1 both correct), VD fig1 (1 right 1 wrong)
    assert out["fAcc"]["total"] == 2
    assert out["fAcc"]["correct"] == 1
    assert out["easy"]["total"] == 3
    # hard = modified-figure rows: (VD,q0,fig1) and (VD,q1,fig1)
    assert out["hard"]["total"] == 2
    assert out["hard"]["correct"] == 1


def test_hallusion_judge_parse():
    assert hallusion.parse_judge_output("The answer is correct.") == 1
    assert hallusion.parse_judge_output("INCORRECT prediction") == 0
    assert hallusion.parse_judge_output("hard to say") == 2


def test_chair500_list():
    from halva_tpu.evals.runner import chair500_image_list

    lst = chair500_image_list()
    assert len(lst) == 500
    assert lst[0] == "COCO_val2014_000000002239.jpg"
    assert all(n.startswith("COCO_val2014_") for n in lst)


def test_chair_from_coco(tmp_path):
    """GT build from synthetic COCO instances+captions files."""
    insts = {
        "categories": [{"id": 1, "name": "dog"}, {"id": 2, "name": "frisbee"}],
        "images": [],
        "annotations": [
            {"image_id": 42, "category_id": 1},
            {"image_id": 42, "category_id": 2},
            {"image_id": 7, "category_id": 1},
        ],
    }
    caps = {
        "images": [],
        "annotations": [
            {"image_id": 42, "caption": "A dog catches a frisbee."},
            {"image_id": 7, "caption": "A puppy near a bench."},
        ],
    }
    for split in ("train", "val"):
        (tmp_path / f"instances_{split}2014.json").write_text(
            json.dumps(insts if split == "val" else
                       {"categories": insts["categories"], "images": [],
                        "annotations": []})
        )
        (tmp_path / f"captions_{split}2014.json").write_text(
            json.dumps(caps if split == "val" else
                       {"images": [], "annotations": []})
        )
    ev = chair.ChairEvaluator.from_coco(str(tmp_path))
    assert ev.imid_to_objects[42] == {"dog", "frisbee"}
    # caption-derived: puppy -> dog (synonym), bench from caption
    assert "dog" in ev.imid_to_objects[7]
    assert "bench" in ev.imid_to_objects[7]

    out = ev.compute(["A dog and a cat."], [42])
    assert out["overall_metrics"]["CHAIRs"] == 1.0  # cat hallucinated

    # pickle cache roundtrip
    cache = tmp_path / "chair.pkl"
    ev.save_cache(str(cache))
    ev2 = chair.ChairEvaluator.from_cache(str(cache))
    assert ev2.imid_to_objects[42] == {"dog", "frisbee"}
