"""Build tiny REAL (HF-loadable) tokenizers for e2e tests.

The data pipeline needs char-alignable pieces (train/data.py
token_char_offsets): a BPE with Metaspace pre-tokenization
(sentencepiece-style "▁" word marker, prepend_scheme="first"), a
TemplateProcessing BOS, and an added literal "\n" token (without it the
newline disappears into <unk> and every sample is dropped). No
sentencepiece needed — only the `tokenizers` library.

Two builders:
- build_tiny_tokenizer: char-level (merge-free) — smallest/fastest, for
  pipeline-mechanics tests where prompt LENGTH does not matter.
- build_bpe_tokenizer: a merge-trained BPE whose tokens-per-char on the
  eval prompts matches llama's (~0.25-0.3) — the fixture for anything
  that MEASURES at prompt-length-sensitive shapes. The round-4 char-
  level fixture inflated CHAIR prompts ~200 tokens past real length
  (Sp=831 vs ~630; reference prompt construction
  eval_hall/model_vqa_loader.py:49-57), which alone OOM'd the b56
  int8-KV eval config (round-4 verdict item 7).
"""

import string


def build_tiny_tokenizer(save_dir: str):
    """Create + save a PreTrainedTokenizerFast dir; returns the loaded
    tokenizer."""
    from tokenizers import Tokenizer, models, pre_tokenizers, processors
    from transformers import PreTrainedTokenizerFast

    chars = sorted(set(string.printable) - set("\t\r\x0b\x0c"))
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2, "▁": 3}
    for c in chars:
        if c == " ":
            continue
        vocab.setdefault(c, len(vocab))
        vocab.setdefault("▁" + c, len(vocab))
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="first"
    )
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A",
        pair="<s> $A $B",
        special_tokens=[("<s>", 1)],
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<s>",
        eos_token="</s>",
        unk_token="<unk>",
        pad_token="</s>",
    )
    fast.add_tokens(["\n"])
    fast.save_pretrained(save_dir)
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(save_dir)


# Deterministic training corpus for build_bpe_tokenizer: the strings the
# eval fixtures actually tokenize (conversation system prompts + CHAIR-
# style questions) plus enough generic English that common words get
# whole-word merges. ~120 common words; repetition teaches the trainer
# the merges, variety keeps coverage honest.
_COMMON_WORDS = (
    "the of and a to in is you that it he was for on are as with his "
    "they I at be this have from or one had by word but not what all "
    "were we when your can said there use an each which she do how "
    "their if will up other about out many then them these so some her "
    "would make like him into time has look two more write go see "
    "number no way could people my than first water been call who oil "
    "its now find long down day did get come made may part image photo "
    "picture describe detail detailed man woman dog cat car bike table "
    "chair person tree sky street room building red blue green white "
    "black small large little big left right front behind near sitting "
    "standing holding wearing next to scene background answer question "
    "please provide single word yes or no there appears visible shown"
).split()


def _bpe_corpus():
    from halva_tpu.conversation import conv_templates

    lines = []
    # real fixture prompts: every template's system prompt + CHAIR/POPE
    # questions — the strings the eval fixture actually tokenizes
    for conv in conv_templates.values():
        if conv.system:
            lines.append(conv.system)
    lines += [
        "Please describe this image in detail.",
        "Provide a one-sentence caption for the provided image.",
        "Is there a dog in the image? Answer the question using a "
        "single word or phrase.",
    ] * 4
    words = list(_COMMON_WORDS)
    for i in range(400):
        # deterministic pseudo-sentences (no RNG: stable across runs)
        k = (i * 7) % len(words)
        lines.append(
            " ".join(words[(k + j * 13) % len(words)] for j in range(12))
            + "."
        )
    return lines * 8


def build_bpe_tokenizer(save_dir: str, vocab_size: int = 2048):
    """Merge-trained BPE fixture with llama-like density on the eval
    prompts (tokens-per-char ~0.3 on the v1 system prompt; pinned by
    tests/test_tokutil.py). Same lossless-pieces contract as
    build_tiny_tokenizer: full printable initial alphabet, Metaspace
    "first", BOS template, literal "\n" added token."""
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, processors,
    )
    from tokenizers.trainers import BpeTrainer
    from transformers import PreTrainedTokenizerFast

    chars = sorted(set(string.printable) - set("\t\r\x0b\x0c \n"))
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="first"
    )
    tok.decoder = decoders.Metaspace(
        replacement="▁", prepend_scheme="first"
    )
    trainer = BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=chars + ["▁"],
        show_progress=False,
        # cap merges at 7 chars (incl. the "▁" marker): the tiny corpus
        # would otherwise memorize the fixture prompts as whole-word
        # tokens (density 0.15 tok/char — HALF of llama) and skew the
        # measured prompt lengths low just as the char-level fixture
        # skewed them high. 7 lands density ~0.26, llama's regime.
        max_token_length=7,
    )
    tok.train_from_iterator(_bpe_corpus(), trainer=trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A",
        pair="<s> $A $B",
        special_tokens=[("<s>", tok.token_to_id("<s>"))],
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<s>",
        eos_token="</s>",
        unk_token="<unk>",
        pad_token="</s>",
    )
    fast.add_tokens(["\n"])
    fast.save_pretrained(save_dir)
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(save_dir)
