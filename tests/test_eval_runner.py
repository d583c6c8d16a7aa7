"""Batched eval generation driver on the tiny model: request builders,
bucketing, answers JSONL schema."""

import json

import numpy as np
import pytest
from PIL import Image

import jax

from halva_tpu.config import LLAVA_TINY
from halva_tpu.evals.runner import (
    BatchedGenerator,
    EvalRequest,
    build_prompt,
    split_chunk,
    vqa_requests,
    write_answers_jsonl,
)
from halva_tpu.mm_utils import ImageProcessor
from halva_tpu.models import llava

from test_data_pipeline import SPTok


def test_build_prompt_matches_reference_contract():
    p = build_prompt("What is this?", "v1")
    assert p.startswith("A chat between")
    assert "<image>\nWhat is this?" in p
    assert p.endswith("ASSISTANT:")


def test_split_chunk():
    lst = list(range(10))
    chunks = [split_chunk(lst, 3, i) for i in range(3)]
    assert sum(chunks, []) == lst
    assert len(chunks[0]) == 4


def test_batched_generator_e2e(tmp_path):
    rng = np.random.RandomState(0)
    img_paths = []
    for i in range(5):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (32, 40, 3), dtype=np.uint8)
        ).save(p)
        img_paths.append(str(p))

    reqs = [
        EvalRequest(
            question_id=i,
            text=f"Describe item number {i} in detail please." * (1 + i % 2),
            image_path=img_paths[i],
        )
        for i in range(5)
    ]

    params = llava.init_params(jax.random.PRNGKey(0), LLAVA_TINY)
    gen = BatchedGenerator(
        params,
        LLAVA_TINY,
        SPTok(),
        ImageProcessor(size=28, crop_size=28),
        batch_size=2,
        max_new_tokens=4,
        prompt_bucket=16,
        attn_impl="xla",
    )
    texts = gen.run(reqs)
    assert len(texts) == 5
    assert all(isinstance(t, str) for t in texts)

    out = tmp_path / "answers.jsonl"
    write_answers_jsonl(str(out), reqs, texts, model_id="tiny")
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 5
    assert set(rows[0]) >= {
        "question_id", "prompt", "text", "answer_id", "model_id",
    }
    assert [r["question_id"] for r in rows] == list(range(5))


def test_vqa_requests(tmp_path):
    qf = tmp_path / "questions.jsonl"
    qf.write_text(
        "\n".join(
            json.dumps(
                {"question_id": i, "image": f"i{i}.jpg", "text": f"q{i}"}
            )
            for i in range(4)
        )
    )
    reqs = vqa_requests(str(qf), "/imgs", num_chunks=2, chunk_idx=1)
    assert len(reqs) == 2
    assert reqs[0].question_id == 2
    assert reqs[0].image_path == "/imgs/i2.jpg"


def test_batched_generator_beams(tmp_path):
    """--num-beams surface through BatchedGenerator: beam decode runs
    end-to-end and differs from greedy only in token choice (same
    request count/ordering); invalid combos are rejected."""
    rng = np.random.RandomState(3)
    img_paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (32, 40, 3), dtype=np.uint8)
        ).save(p)
        img_paths.append(str(p))
    reqs = [
        EvalRequest(
            question_id=i,
            text=f"What is object {i}?",
            image_path=img_paths[i],
        )
        for i in range(3)
    ]
    params = llava.init_params(jax.random.PRNGKey(1), LLAVA_TINY)
    common = dict(
        tokenizer=SPTok(),
        image_processor=ImageProcessor(size=28, crop_size=28),
        batch_size=2,
        max_new_tokens=4,
        prompt_bucket=16,
        attn_impl="xla",
    )
    texts = BatchedGenerator(
        params, LLAVA_TINY, num_beams=2, **common
    ).run(reqs)
    assert len(texts) == 3
    assert all(isinstance(t, str) for t in texts)

    with pytest.raises(ValueError):
        BatchedGenerator(
            params, LLAVA_TINY, num_beams=2, temperature=0.7, **common
        )


def test_batched_generator_continuous_matches_drain(tmp_path):
    """--continuous must produce the same texts as the bucketed-drain
    path for the same requests (greedy, no EOS ambiguity at tiny
    scale: budget exits only)."""
    rng = np.random.RandomState(1)
    img_paths = []
    for i in range(10):
        p = tmp_path / f"cimg{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (32, 40, 3), dtype=np.uint8)
        ).save(p)
        img_paths.append(str(p))
    reqs = [
        EvalRequest(
            question_id=i,
            text=f"Describe item number {i} in detail." * (1 + i % 3),
            image_path=img_paths[i],
        )
        for i in range(10)
    ]
    params = llava.init_params(jax.random.PRNGKey(0), LLAVA_TINY)
    common = dict(
        tokenizer=SPTok(),
        image_processor=ImageProcessor(size=28, crop_size=28),
        batch_size=8,
        max_new_tokens=6,
        prompt_bucket=16,
        attn_impl="xla",
    )
    drain = BatchedGenerator(params, LLAVA_TINY, **common)
    cont = BatchedGenerator(
        params, LLAVA_TINY, continuous=True, prefetch_workers=2,
        **common,
    )
    t_drain = drain.run(reqs)
    t_cont = cont.run(reqs)
    assert t_cont == t_drain
    assert cont.last_stats["continuous"] is True
    assert cont.last_stats["refills"] >= 1


def test_continuous_guards():
    params = llava.init_params(jax.random.PRNGKey(1), LLAVA_TINY)
    with pytest.raises(ValueError, match="continuous"):
        BatchedGenerator(
            params, LLAVA_TINY, SPTok(),
            ImageProcessor(size=28, crop_size=28),
            continuous=True, num_beams=2,
        )


def test_batched_generator_spec_matches_greedy(tmp_path):
    """--spec K must produce the same texts as the default greedy path
    (speculative decode is token-exact by construction,
    ops/speculative.py) and report verify-step stats."""
    rng = np.random.RandomState(2)
    img_paths = []
    for i in range(6):
        p = tmp_path / f"simg{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (32, 40, 3), dtype=np.uint8)
        ).save(p)
        img_paths.append(str(p))
    reqs = [
        EvalRequest(
            question_id=i,
            text=f"Describe item number {i}.",
            image_path=img_paths[i],
        )
        for i in range(6)
    ]
    params = llava.init_params(jax.random.PRNGKey(0), LLAVA_TINY)
    common = dict(
        tokenizer=SPTok(),
        image_processor=ImageProcessor(size=28, crop_size=28),
        batch_size=6,
        max_new_tokens=6,
        prompt_bucket=16,
        attn_impl="xla",
    )
    greedy = BatchedGenerator(params, LLAVA_TINY, **common)
    spec = BatchedGenerator(params, LLAVA_TINY, spec_k=3, **common)
    t_greedy = greedy.run(reqs)
    t_spec = spec.run(reqs)
    assert t_spec == t_greedy
    assert spec.last_stats["spec_verify_steps"] >= 1
    assert (
        spec.last_stats["spec_emitted_tokens"]
        >= spec.last_stats["spec_verify_steps"]
    )
    with pytest.raises(ValueError, match="spec"):
        BatchedGenerator(
            params, LLAVA_TINY, SPTok(),
            ImageProcessor(size=28, crop_size=28),
            spec_k=4, num_beams=2,
        )
