"""Utility coverage: prefetcher semantics, answer merging, step timer."""

import json
import time

import pytest

from halva_tpu.evals.merge import merge_jsonl
from halva_tpu.utils.logging import StepTimer
from halva_tpu.utils.prefetch import prefetch


def test_prefetch_order_and_completion():
    assert list(prefetch(range(10), depth=3)) == list(range(10))


def test_prefetch_overlaps_producer():
    """Consumer sees items while the producer is still running."""
    produced = []

    def slow_gen():
        for i in range(4):
            produced.append(i)
            time.sleep(0.05)
            yield i

    it = prefetch(slow_gen(), depth=2)
    first = next(it)
    assert first == 0
    # producer ran ahead of the consumer
    time.sleep(0.12)
    assert len(produced) >= 2
    assert list(it) == [1, 2, 3]


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_merge_jsonl(tmp_path):
    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    a.write_text('{"question_id": 3}\n{"question_id": 1}\n')
    b.write_text('{"question_id": 2}\n')
    out = tmp_path / "m.jsonl"
    n = merge_jsonl([str(a), str(b)], str(out), sort_key="question_id")
    assert n == 3
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert [r["question_id"] for r in rows] == [1, 2, 3]


def test_step_timer():
    t = StepTimer(ema=0.5)
    assert t.tick() is None
    time.sleep(0.01)
    dt = t.tick()
    assert dt is not None and dt > 0
    assert t.avg is not None
