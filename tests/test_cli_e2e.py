"""Eval CLI end-to-end on a component checkpoint with a mesh.

Closes the full loop the reference drives with bash + per-GPU processes
(src/evaluate_hall/pope.sh): save a per-component checkpoint (the VILA
layout) -> `python -m halva_tpu.evals.cli pope` loads it WITHOUT a
template, builds the processor from the saved config, tokenizes with a
real HF tokenizer dir, runs mesh-sharded batched decode ({data:2} on
the CPU mesh) with prefetch overlap and dead-row tail padding, and
writes reference-schema answers JSONL.
"""

import json
import sys

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from tokutil import build_bpe_tokenizer  # noqa: E402

from halva_tpu.config import LLAVA_TINY
from halva_tpu.models import llava
from halva_tpu.train import vila as vila_lib


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_e2e")
    tok_dir = str(tmp / "tok")
    # the realistic-density fixture (shared with bench_eval_real):
    # prompt lengths then match real CHAIR shapes (verdict item 7)
    build_bpe_tokenizer(tok_dir)

    params = llava.init_params(jax.random.PRNGKey(0), LLAVA_TINY)
    comp = str(tmp / "components")
    vila_lib.save_components(comp, params, LLAVA_TINY)

    img_dir = tmp / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(6):
        name = f"q_{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)
        ).save(img_dir / name)
        rows.append(
            {
                "question_id": i,
                "text": f"Is there a dog in the image {i}?",
                "image": name,
            }
        )
    qfile = tmp / "pope_questions.jsonl"
    qfile.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return {
        "tok_dir": tok_dir,
        "components": comp,
        "img_dir": str(img_dir),
        "qfile": str(qfile),
        "out": str(tmp / "answers.jsonl"),
    }


def test_pope_cli_on_component_checkpoint_with_mesh(setup):
    from halva_tpu.evals import cli

    cli.main(
        [
            "pope",
            "--model-path", setup["components"],
            "--tokenizer", setup["tok_dir"],
            "--question-file", setup["qfile"],
            "--image-folder", setup["img_dir"],
            "--answers-file", setup["out"],
            "--batch-size", "4",
            "--max-new-tokens", "4",
            "--mesh-data", "2",
            "--prefetch-workers", "2",
        ]
    )
    answers = [json.loads(l) for l in open(setup["out"])]
    assert len(answers) == 6
    assert {a["question_id"] for a in answers} == set(range(6))
    for a in answers:
        # reference answers-JSONL schema (model_vqa_loader.py:122-129)
        assert {"question_id", "prompt", "text", "answer_id",
                "model_id"} <= set(a)


def test_mesh_model_alone_builds_tp_mesh(setup, tmp_path):
    """--mesh-model without --mesh-data must imply {data:1, model:N}
    (TP for weights-too-big-per-chip), not silently run single-device
    (round-3 review finding). Answers must match the mesh-data run's
    schema and cover every question."""
    from halva_tpu.evals import cli

    out = str(tmp_path / "answers_tp.jsonl")
    cli.main(
        [
            "pope",
            "--model-path", setup["components"],
            "--tokenizer", setup["tok_dir"],
            "--question-file", setup["qfile"],
            "--image-folder", setup["img_dir"],
            "--answers-file", out,
            "--batch-size", "4",
            "--max-new-tokens", "4",
            "--mesh-model", "2",
        ]
    )
    answers = [json.loads(l) for l in open(out)]
    assert {a["question_id"] for a in answers} == set(range(6))
    # and the texts agree with the {data:2} run (same model, same
    # greedy decode — the mesh layout must not change tokens)
    prev = {
        a["question_id"]: a["text"]
        for a in map(json.loads, open(setup["out"]))
    }
    for a in answers:
        assert a["text"] == prev[a["question_id"]], a
