"""Build a tiny REAL (HF-loadable) tokenizer for e2e tests.

The data pipeline needs char-alignable pieces (train/data.py
token_char_offsets): a char-level BPE with Metaspace pre-tokenization
(sentencepiece-style "▁" word marker, prepend_scheme="first"), a
TemplateProcessing BOS, and an added literal "\n" token (without it the
newline disappears into <unk> and every sample is dropped). No
sentencepiece needed — only the `tokenizers` library.
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
