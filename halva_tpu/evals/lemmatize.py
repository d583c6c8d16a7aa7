"""Lemmatization with graceful degradation.

The reference metrics use nltk WordNet lemmatization + POS tagging
(eval_hall/eval_chair.py:204-220, eval_hall/amber/inference.py:47-52),
which require downloadable corpora. When the corpora are present we use
them (bit-parity with the reference); otherwise a rule-based noun
singularizer covers the COCO/AMBER object vocabulary the metrics actually
look up.
"""

from __future__ import annotations

import re
from typing import List

_IRREGULAR = {
    "people": "people",  # kept: it's in the synonym table as-is
    "men": "man",
    "women": "woman",
    "children": "child",
    "teeth": "tooth",
    "feet": "foot",
    "mice": "mouse",
    "geese": "goose",
    "knives": "knife",
    "leaves": "leaf",
    "loaves": "loaf",
    "shelves": "shelf",
    "wolves": "wolf",
    "lives": "life",
    "buses": "bus",
    "glasses": "glass",
    "dishes": "dish",
    "benches": "bench",
    "sandwiches": "sandwich",
    "couches": "couch",
    "scissors": "scissors",
    "skis": "skis",
    "pants": "pants",
}

_KEEP_S = {
    "is", "his", "this", "us", "as", "was", "has", "its", "gas",
    "bus", "plus", "grass", "glass", "class", "cross", "dress",
    "less", "miss", "pass", "press", "across", "chess", "tennis",
    "analysis", "basis",
}


def _candidates(w: str) -> List[str]:
    """Possible singulars, most-specific first (WordNet morphy's noun
    suffix rules: s->'', ses->s, ves->f/fe, xes->x, zes->z, ches->ch,
    shes->sh, ies->y, men->man — morphy tries each and keeps forms found
    in the dictionary; with a vocab we replicate that exactly)."""
    out = []
    if w.endswith("ies") and len(w) > 4:
        out += [w[:-3] + "y", w[:-1]]  # ponies->pony, collies->collie
    if w.endswith(("ches", "shes", "xes", "zes", "sses", "uses", "ises")):
        out.append(w[:-2])
    if w.endswith("ves") and len(w) > 4:
        out += [w[:-3] + "f", w[:-3] + "fe"]
    if w.endswith("oes") and len(w) > 4:
        out += [w[:-2], w[:-1]]  # potatoes->potato, canoes->canoe
    if w.endswith("men"):
        out.append(w[:-3] + "man")
    if w.endswith("s") and not w.endswith("ss"):
        out.append(w[:-1])
    out.append(w)
    return out


def singularize(word: str, vocab=None) -> str:
    """Noun singular. With `vocab` (the metric's own object vocabulary —
    what WordNet's dictionary provides for morphy), the first candidate
    present in the vocab wins, which makes lookups exact on that vocab
    (tests/test_lemmatize_drift.py proves the round-trip for the full
    CHAIR synonym table). Without a vocab, heuristic rules."""
    w = word.lower()
    if vocab is not None:
        if w in vocab:
            return w
        for c in _candidates(w):
            if c in vocab:
                return c
    if w in _IRREGULAR:
        return _IRREGULAR[w]
    if w in _KEEP_S or len(w) <= 3:
        return w
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "xes", "zes", "sses", "uses")):
        return w[:-2]
    if w.endswith("oes") and len(w) > 4:
        return w[:-2]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    return w


_WORD_RE = re.compile(r"[a-zA-Z']+|[0-9]+|[^\sa-zA-Z0-9]")


def simple_tokenize(text: str) -> List[str]:
    return _WORD_RE.findall(text)


def _nltk_available() -> bool:
    try:
        import nltk
        from nltk.stem import WordNetLemmatizer

        WordNetLemmatizer().lemmatize("dogs")
        nltk.word_tokenize("a b")
        nltk.pos_tag(["a"])
        return True
    except Exception:
        return False


_HAS_NLTK = None


def has_nltk() -> bool:
    global _HAS_NLTK
    if _HAS_NLTK is None:
        _HAS_NLTK = _nltk_available()
    return _HAS_NLTK


def lemmatize_caption(caption: str, vocab=None) -> List[str]:
    """Tokenize + lemmatize a caption (reference caption_to_words
    preprocessing, eval_chair.py:211-220). `vocab` = the calling metric's
    object vocabulary; see singularize."""
    if has_nltk():
        import nltk
        from nltk.corpus import wordnet
        from nltk.stem import WordNetLemmatizer

        words = nltk.word_tokenize(caption.lower())
        tagged = nltk.pos_tag(words)
        wnl = WordNetLemmatizer()
        pos_map = {"J": wordnet.ADJ, "V": wordnet.VERB,
                   "N": wordnet.NOUN, "R": wordnet.ADV}
        return [
            wnl.lemmatize(w, pos_map.get(t[:1], wordnet.NOUN))
            for w, t in tagged
        ]
    return [
        singularize(w, vocab) for w in simple_tokenize(caption.lower())
    ]


def extract_nouns(text: str, vocab=None) -> List[str]:
    """AMBER noun extraction (inference.py:47-52); fallback keeps all
    lemmatized word tokens (the metric then filters against its own
    hallucination vocabulary, so non-nouns drop out naturally)."""
    if has_nltk():
        import nltk
        from nltk.stem import WordNetLemmatizer

        tokens = nltk.word_tokenize(text)
        tagged = nltk.pos_tag(tokens)
        wnl = WordNetLemmatizer()
        return [
            wnl.lemmatize(w) for w, pos in tagged if pos.startswith("NN")
        ]
    return [
        singularize(w, vocab)
        for w in simple_tokenize(text.lower())
        if w.isalpha()
    ]
