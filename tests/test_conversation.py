"""Prompt rendering parity with the reference conversation templates.

Golden strings are hand-derived from the reference state machine
(/root/reference/llava/conversation.py:42-60) for the v1 template HALVA
requires (train_halva.py:1188 asserts v1/vicuna_v1).
"""

from halva_tpu.conversation import (
    SeparatorStyle,
    conv_templates,
    get_template,
)

V1_SYSTEM = (
    "A chat between a curious user and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the user's questions."
)


def test_v1_full_turn():
    t = get_template("v1")
    got = t.prompt("<image>\nWhat is this?", "A cat.")
    want = (
        V1_SYSTEM + " USER: <image>\nWhat is this? ASSISTANT: A cat.</s>"
    )
    assert got == want


def test_v1_generation_prompt():
    t = get_template("v1")
    got = t.prompt("Describe the image in detail.")
    want = (
        V1_SYSTEM + " USER: Describe the image in detail. ASSISTANT:"
    )
    assert got == want


def test_v1_multi_turn():
    t = get_template("v1")
    got = t.render(
        [
            ("USER", "q1"),
            ("ASSISTANT", "a1"),
            ("USER", "q2"),
            ("ASSISTANT", None),
        ]
    )
    want = V1_SYSTEM + " USER: q1 ASSISTANT: a1</s>USER: q2 ASSISTANT:"
    assert got == want


def test_v1_stop_str():
    assert get_template("v1").stop_str() == "</s>"


def test_registry_aliases():
    assert conv_templates["v1"] is conv_templates["vicuna_v1"]
    assert get_template("v1").sep_style == SeparatorStyle.TWO


def test_single_style():
    t = get_template("v0")
    got = t.render([("Human", "hi"), ("Assistant", None)])
    assert got.endswith("###Human: hi###Assistant:")


def test_plain_style():
    t = get_template("plain")
    got = t.render([("", "<image>cap"), ("", "a photo")])
    assert got == "<image>cap\na photo\n"
