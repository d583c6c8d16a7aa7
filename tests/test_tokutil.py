"""The e2e fixture tokenizers: lossless pieces + realistic density.

build_bpe_tokenizer exists because measured prompt length drives real
serving shapes: the round-4 char-level fixture made CHAIR prompts
Sp=831 instead of ~630 (reference prompt construction,
eval_hall/model_vqa_loader.py:49-57), which alone OOM'd the b56
int8-KV eval config. These tests pin (a) llama-like tokens-per-char on
the strings the eval fixture tokenizes, (b) the lossless-offsets
contract train/data.py::token_char_offsets depends on, (c) clean
decode round trip for generated captions."""

import sys

import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from tokutil import build_bpe_tokenizer, build_tiny_tokenizer  # noqa: E402

SYS_PROMPT = (
    "A chat between a curious human and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite "
    "answers to the human's questions."
)


@pytest.fixture(scope="module")
def bpe(tmp_path_factory):
    return build_bpe_tokenizer(
        str(tmp_path_factory.mktemp("tok") / "bpe")
    )


def test_llama_like_density(bpe):
    # llama tokenizes English at ~0.25-0.28 tokens/char; the fixture
    # must land in that regime (char-level was 1.0, memorized-words 0.15)
    n = len(bpe(SYS_PROMPT, add_special_tokens=False)["input_ids"])
    density = n / len(SYS_PROMPT)
    assert 0.20 <= density <= 0.40, density
    q = "Please provide a detailed description of the image."
    nq = len(bpe(q, add_special_tokens=False)["input_ids"])
    assert 0.15 <= nq / len(q) <= 0.45, nq / len(q)


def test_lossless_offsets(bpe):
    # the train/data.py char-offset contract: offsets from the fast
    # tokenizer must tile the original string exactly
    text = "I see <MASK>a red car</MASK> and two dogs.\nYes, really!"
    enc = bpe(
        text, add_special_tokens=False, return_offsets_mapping=True
    )
    rebuilt = "".join(
        text[a:b] for a, b in enc["offset_mapping"]
    )
    assert rebuilt == text
    # no <unk>: every printable char reachable
    assert bpe.unk_token_id not in enc["input_ids"]


def test_decode_round_trip(bpe):
    s = "Hello, world!\nWeird chars: ~#$% and digits 01234."
    out = bpe.decode(bpe(s)["input_ids"], skip_special_tokens=True)
    assert out == s


def test_bos_template(bpe):
    ids = bpe("hi")["input_ids"]
    assert ids[0] == bpe.bos_token_id


def test_tiny_still_charlevel(tmp_path):
    tok = build_tiny_tokenizer(str(tmp_path / "tiny"))
    n = len(tok(SYS_PROMPT, add_special_tokens=False)["input_ids"])
    assert n >= len(SYS_PROMPT) * 0.9  # char-level by design
