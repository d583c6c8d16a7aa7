"""MASK-span data pipeline: span extraction, sign assignment, label masks,
collation — with a sentencepiece-like fake tokenizer (▁ pieces, byte
fallback for newline, literal </s>)."""

import numpy as np
import pytest

from halva_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from halva_tpu.mm_utils import tokenizer_image_token
from halva_tpu.train.data import (
    assign_signs,
    balance_yes_no,
    collate,
    encode_masked_conversation,
    encode_plain_conversation,
    phrase_spans,
    token_char_offsets,
)


class SPTok:
    """Mimics a sentencepiece slow tokenizer: dummy-prefix space, "▁"
    word pieces, punctuation pieces, <0x0A> newline, literal </s> -> eos."""

    bos_token_id = 1
    eos_token_id = 2

    def __init__(self):
        self.piece_to_id = {"<s>": 1, "</s>": 2, "<0x0A>": 3}
        self.id_to_piece = {v: k for k, v in self.piece_to_id.items()}

    def _pid(self, piece):
        if piece not in self.piece_to_id:
            pid = len(self.piece_to_id) + 10
            self.piece_to_id[piece] = pid
            self.id_to_piece[pid] = piece
        return self.piece_to_id[piece]

    def _pieces(self, text):
        import re

        out = []
        for seg_i, seg in enumerate(text.split("</s>")):
            if seg_i > 0:
                out.append("</s>")
            if not seg:
                continue
            # sp dummy prefix: a virtual leading space
            s = " " + seg if not seg.startswith(" ") else seg
            i = 0
            toks = re.findall(r" ?[A-Za-z0-9']+| |\n|[^\sA-Za-z0-9]", s)
            for t in toks:
                if t == "\n":
                    out.append("<0x0A>")
                elif t.startswith(" "):
                    out.append("▁" + t[1:])
                else:
                    out.append(t)
        return out

    def __call__(self, text):
        ids = [self.bos_token_id] + [
            self._pid(p) for p in self._pieces(text)
        ]

        class R:
            input_ids = ids

        return R()

    def convert_ids_to_tokens(self, ids):
        return [self.id_to_piece[i] for i in ids]

    def decode(self, ids, skip_special_tokens=True):
        pieces = [
            self.id_to_piece.get(i, f"<{i}>")
            for i in ids
            if not (skip_special_tokens and i in (1, 2))
        ]
        s = "".join(
            "\n" if p == "<0x0A>" else p.replace("▁", " ") for p in pieces
        )
        return s.lstrip(" ")


def test_phrase_spans_basic():
    text, spans = phrase_spans("a <MASK>red car</MASK> on the road")
    assert text == "a red car on the road"
    assert spans == [(2, 9)]
    assert text[2:9] == "red car"


def test_phrase_spans_trailing_punct():
    text, spans = phrase_spans("there is a <MASK>cat </MASK>. Next to it")
    assert text == "there is a cat. Next to it"
    s, e = spans[0]
    assert text[s:e] == "cat"


def test_phrase_spans_possessive():
    text, spans = phrase_spans("<MASK>the dog </MASK>'s tail")
    assert text == "the dog's tail"
    s, e = spans[0]
    assert text[s:e] == "the dog"


def test_phrase_spans_multiple():
    text, spans = phrase_spans(
        "has <MASK>two dogs</MASK> and <MASK>a ball</MASK>."
    )
    assert text == "has two dogs and a ball."
    assert [text[s:e] for s, e in spans] == ["two dogs", "a ball"]


def test_token_char_offsets_roundtrip():
    tok = SPTok()
    text = "Hello world, this is fine.\nNew line"
    ids = tok(text).input_ids
    offs = token_char_offsets(tok, ids, text)
    assert len(offs) == len(ids)
    # every non-empty interval must reproduce its text slice via pieces
    rebuilt = "".join(text[a:b] for a, b in offs)
    assert rebuilt == text


def test_encode_masked_conversation():
    tok = SPTok()
    q = "<image>\nWhat do you see?"
    masked = "I see <MASK>a red car</MASK> and <MASK>two dogs </MASK>."
    unmasked = "I see a red car and two dogs."
    enc = encode_masked_conversation(q, masked, unmasked, tok)
    assert enc is not None

    # invariant: ids == tokenizer_image_token(unmasked prompt)
    from halva_tpu.conversation import get_template

    prompt = get_template("v1").prompt(q.replace("<image>\n", "<image>\n"),
                                       unmasked)
    want_ids = tokenizer_image_token(prompt, tok)
    np.testing.assert_array_equal(enc.input_ids, np.asarray(want_ids))

    # signs: phrase 1 covers "a red car", phrase 2 covers "two dogs"
    sign_tokens = {
        k: tok.decode(enc.input_ids[enc.signs == k].tolist()).strip()
        for k in (1, 2)
    }
    assert sign_tokens[1] == "a red car"
    assert sign_tokens[2] == "two dogs"
    # the trailing period is not part of phrase 2
    assert "." not in sign_tokens[2]

    # labels: instruction ignored, answer supervised
    n_sup = int(np.sum(enc.labels != IGNORE_INDEX))
    ans_ids = tok("I see a red car and two dogs.</s>").input_ids[1:]
    assert n_sup == len(ans_ids)
    sup = enc.labels[enc.labels != IGNORE_INDEX]
    np.testing.assert_array_equal(sup, np.asarray(ans_ids))

    # image sentinel position has sign 0 and ignored label
    img = np.where(enc.input_ids == IMAGE_TOKEN_INDEX)[0]
    assert len(img) == 1
    assert enc.signs[img[0]] == 0
    assert enc.labels[img[0]] == IGNORE_INDEX


def test_encode_masked_drop_on_mismatch():
    tok = SPTok()
    enc = encode_masked_conversation(
        "<image>\nQ?", "<MASK>a cat</MASK>", "a dog", tok
    )
    assert enc is None  # unmasked text disagrees -> dropped


def test_encode_plain_conversation_multiturn():
    tok = SPTok()
    enc = encode_plain_conversation(
        [("<image>\nWhat?", "A cat."), ("And now?", "A dog.")], tok
    )
    assert enc is not None
    assert (enc.signs == 0).all()
    sup = enc.labels[enc.labels != IGNORE_INDEX]
    text = tok.decode([int(x) for x in sup])
    assert "A cat." in text and "A dog." in text
    # question tokens are not supervised
    full = tok.decode([int(x) for x in enc.input_ids if x > 0])
    assert "What?" in full
    assert "What?" not in text


def test_balance_yes_no():
    data = (
        [{"tag": "qa", "raw_answer": "Yes", "i": i} for i in range(6)]
        + [{"tag": "qa", "raw_answer": "No", "i": i} for i in range(2)]
        + [{"tag": "open", "raw_answer": "x", "i": 9}]
        + [{"tag": "closed", "raw_answer": "y", "i": 10}]
    )
    out = balance_yes_no(data)
    qa = [s for s in out if s["tag"] == "qa"]
    yes = [s for s in qa if s["raw_answer"] == "Yes"]
    no = [s for s in qa if s["raw_answer"] == "No"]
    assert len(yes) == len(no) == 2
    assert len(out) == 2 + 2 + 2


def test_collate_shapes():
    def samp(n, m, r):
        return {
            "input_ids": np.arange(n, dtype=np.int32),
            "labels": np.arange(n, dtype=np.int32),
            "pos_signs": np.zeros(n, np.int32),
            "neg_input_ids": np.arange(m, dtype=np.int32),
            "neg_labels": np.arange(m, dtype=np.int32),
            "neg_signs": np.zeros(m, np.int32),
            "ref_input_ids": np.arange(r, dtype=np.int32),
            "ref_labels": np.arange(r, dtype=np.int32),
            "image": np.zeros((3, 8, 8), np.float32),
            "ref_image": np.zeros((3, 8, 8), np.float32),
        }

    batch = collate([samp(10, 20, 5), samp(15, 7, 30)], pad_token_id=0,
                    pad_multiple=16)
    assert batch["input_ids"].shape == (2, 32)  # pos/neg common bucket
    assert batch["neg_input_ids"].shape == (2, 32)
    assert batch["ref_input_ids"].shape == (2, 32)
    assert batch["segment_ids"][0, :10].all()
    assert not batch["segment_ids"][0, 10:].any()
    assert (batch["labels"][0, 10:] == IGNORE_INDEX).all()
    assert batch["images"].shape == (2, 3, 8, 8)


def test_encode_plain_conversation_mpt_style():
    from halva_tpu.conversation import get_template

    tok = SPTok()
    enc = encode_plain_conversation(
        [("What?", "A cat.")], tok, get_template("mpt")
    )
    assert enc is not None
    sup = enc.labels[enc.labels != IGNORE_INDEX]
    text = tok.decode([int(x) for x in sup])
    assert "A cat." in text
    assert "What?" not in text


def test_encode_plain_conversation_llama2_style():
    from halva_tpu.conversation import get_template

    tok = SPTok()
    enc = encode_plain_conversation(
        [("Q one?", "Answer one."), ("Q two?", "Answer two.")],
        tok,
        get_template("llama_2"),
    )
    assert enc is not None
    sup = enc.labels[enc.labels != IGNORE_INDEX]
    text = tok.decode([int(x) for x in sup])
    assert "Answer one." in text and "Answer two." in text
    assert "Q one?" not in text
