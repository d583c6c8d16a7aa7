"""Bound the rule-based-lemmatizer drift vs WordNet on the vocabulary the
metrics actually consult (VERDICT r1 weak-8).

This container has no nltk corpora, so the shipped CHAIR/AMBER behavior is
ALWAYS the fallback singularizer (evals/lemmatize.py). The metrics pass
their object vocabulary as the singularizer's dictionary (the same role
WordNet's dictionary plays for morphy), which makes lookups exact on that
vocabulary. These tests prove it for (a) the FULL CHAIR synonym table —
every single-word entry round-trips through its English plural into its
synonym group — and (b) a canned caption corpus with hand-derived
WordNet-equivalent goldens (morphy on these common nouns yields exactly
these singulars; recorded as fixture data since corpora cannot be
downloaded in this image).
"""

import re

import pytest

from halva_tpu.evals.chair import SYNONYM_GROUPS
from halva_tpu.evals.lemmatize import lemmatize_caption, singularize

# words that are lemmas in plural-looking form (WordNet keeps them as-is)
_PLURAL_LEMMAS = {"scissors", "skis", "pants", "people", "glasses"}

_IRREGULAR_PLURALS = {
    "person": "people",
    "man": "men",
    "woman": "women",
    "child": "children",
    "tooth": "teeth",
    "foot": "feet",
    "mouse": "mice",
    "goose": "geese",
    "knife": "knives",
    "leaf": "leaves",
    "loaf": "loaves",
    "shelf": "shelves",
    "wolf": "wolves",
    "life": "lives",
}


def _pluralize(w: str) -> str:
    if w in _IRREGULAR_PLURALS:
        return _IRREGULAR_PLURALS[w]
    if re.search(r"(s|x|z|ch|sh)$", w):
        return w + "es"
    if re.search(r"[^aeiou]y$", w):
        return w[:-1] + "ies"
    return w + "s"


def _vocab():
    """All single-word tokens of the CHAIR synonym table (what
    CHAIR._object_set holds for single words) + group membership map."""
    words = set()
    group_of = {}
    for group in SYNONYM_GROUPS:
        for entry in group:
            # multiword entries ("sports ball") are matched through the
            # double-word machinery, not per-token lemmatization; the
            # table's one mixed-case entry ("iPhone") can never match a
            # lowercased caption in the REFERENCE either (eval_chair.py
            # lowercases first) — bug-compatible, excluded here
            if " " in entry or entry != entry.lower():
                continue
            w = entry
            if w.isalpha():
                words.add(w)
                group_of.setdefault(w, set()).update(
                    x for e in group for x in e.split()
                )
    return words, group_of


def test_chair_vocab_plural_roundtrip():
    """For every single-word CHAIR vocabulary token: its English plural
    must singularize (vocab-aware, as the metric runs it) back into the
    same synonym group — i.e. the CHAIR lookup can never miss a plural
    mention of a known object."""
    vocab, group_of = _vocab()
    failures = []
    for w in sorted(vocab):
        if w in _PLURAL_LEMMAS:
            got = singularize(w, vocab)
            if got not in group_of[w]:
                failures.append((w, got))
            continue
        plural = _pluralize(w)
        got = singularize(plural, vocab)
        if got not in group_of[w]:
            failures.append((plural, got, w))
    assert not failures, failures[:20]


def test_vocab_words_resolve_to_vocab():
    """Singular vocabulary words must map into the vocabulary
    (e.g. 'bus' -> 'bu' would break lookups)."""
    vocab, group_of = _vocab()
    failures = []
    for w in sorted(vocab):
        got = singularize(w, vocab)
        if got not in group_of[w]:
            failures.append((w, got))
    assert not failures, failures[:20]


def test_chair_caption_to_words_catches_plurals():
    """End-to-end through the metric: plural/irregular object mentions in
    a caption resolve to canonical COCO objects."""
    from halva_tpu.evals.chair import ChairEvaluator

    inst = ChairEvaluator(imid_to_objects={})
    words, node_words, idxs, raw = inst.caption_to_words(
        "Two corgis and three puppies chase several buses past "
        "park benches and women with scissors."
    )
    assert "dog" in node_words  # corgis -> corgi -> dog group
    assert "bus" in node_words
    assert "bench" in node_words
    assert "person" in node_words  # women -> woman -> person group
    assert "scissors" in node_words


# canned captions -> WordNet-equivalent lemma streams (fixture goldens),
# run vocab-less (the AMBER fallback path without its word list)
CANNED = [
    (
        "Two dogs are chasing three cats across the benches.",
        ["two", "dog", "are", "chasing", "three", "cat", "across",
         "the", "bench", "."],
    ),
    (
        "Several buses near parking meters; children fly kites.",
        ["several", "bus", "near", "parking", "meter", ";", "child",
         "fly", "kite", "."],
    ),
]


@pytest.mark.parametrize("caption,want", CANNED)
def test_canned_caption_lemmas(caption, want):
    from halva_tpu.evals import lemmatize

    if lemmatize.has_nltk():  # pragma: no cover - not in this image
        pytest.skip("real nltk present; fallback not in use")
    assert lemmatize_caption(caption) == want
