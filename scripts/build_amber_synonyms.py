"""One-time OFFLINE builder for the AMBER synonym table.

The reference scores AMBER generative metrics with live spaCy
word-vector similarity (eval_hall/amber/inference.py:40-44,
en_core_web_lg, threshold 0.8). This environment has no network and no
spaCy model, so halva_tpu.evals.amber falls back to exact matching —
slightly stricter CHAIR/Cover (delta bounded in
tests/test_eval_metrics.py).

Run THIS script once on any machine that has spacy + en_core_web_lg:

    python scripts/build_amber_synonyms.py \
        --relation /path/to/AMBER/data/relation.json \
        --out amber_synonyms.json [--threshold 0.8]

then point HALVA_AMBER_SYNONYMS at the output on the scoring machine —
evals/amber.make_synonym_fn picks it up and generative metrics become
digit-parity with the reference. The table is the pairwise >threshold
closure over the AMBER hallucination vocabulary (truth+hallu word
association keys and values, ~1k nouns => ~500k pairs checked, a few
minutes; output is small because matches are sparse).
"""

import argparse
import itertools
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--relation", required=True,
                    help="AMBER data/relation.json (word association)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args()

    import spacy

    nlp = spacy.load("en_core_web_lg")

    with open(args.relation, encoding="utf-8") as f:
        assoc = json.load(f)
    vocab = set(assoc)
    for ws in assoc.values():
        vocab.update(ws)
    vocab = sorted(vocab)
    docs = {w: nlp(w) for w in vocab}

    table = {}
    for w1, w2 in itertools.combinations(vocab, 2):
        if docs[w1].similarity(docs[w2]) > args.threshold:
            table.setdefault(w1, []).append(w2)

    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(table, f, indent=0, sort_keys=True)
    n_pairs = sum(len(v) for v in table.values())
    print(f"wrote {args.out}: {len(table)} head words, {n_pairs} pairs")


if __name__ == "__main__":
    main()
