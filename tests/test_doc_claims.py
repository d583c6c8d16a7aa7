"""Doc-claims sweep (round-4 verdict item 9): every measurement
artifact referenced in README.md / STATUS.md / docs/PERF.md must be a
COMMITTED file, and the headline numbers quoted in README must equal
the values inside the committed artifacts — a test, not a promise.

When a headline changes, update BOTH the doc and the artifact; this
test is the tripwire for numbers that drift from their evidence."""

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOCS = ["README.md", "STATUS.md", "docs/PERF.md"]

# artifact filenames that are allowed to be referenced without existing
# (none today — add entries only with a written justification)
ALLOWED_MISSING: set = set()


def _referenced_artifacts():
    pat = re.compile(r"\b([A-Z][A-Z0-9_]*(?:_r\d+)?\.json)\b")
    refs = {}
    for doc in DOCS:
        p = os.path.join(REPO, doc)
        if not os.path.exists(p):
            continue
        for m in pat.finditer(open(p).read()):
            name = m.group(1)
            refs.setdefault(name, set()).add(doc)
    return refs


def test_every_referenced_artifact_is_committed():
    refs = _referenced_artifacts()
    assert refs, "no artifact references found — regex or docs broken?"
    missing = []
    for name, docs in sorted(refs.items()):
        # wildcards like TRAIN7B_COMM*.json appear as the base name;
        # accept any committed file with that prefix
        base = name[: -len(".json")]
        hits = [
            f for f in os.listdir(REPO)
            if f == name or (f.startswith(base) and f.endswith(".json"))
        ]
        if not hits and name not in ALLOWED_MISSING:
            missing.append(f"{name} (cited in {sorted(docs)})")
    assert not missing, "artifacts cited but not committed:\n" + "\n".join(
        missing
    )


def _load(name):
    with open(os.path.join(REPO, name)) as f:
        return json.load(f)


def test_readme_headline_serving_matches_artifact():
    """Round-5 README carries TWO serving points: the quality-clean
    int4g default and the flat-int4+W4A8 fast mode — each must equal
    its committed SERVING_LADDER.json row."""
    readme = open(os.path.join(REPO, "README.md")).read()
    lad = _load("SERVING_LADDER.json")
    m = re.search(
        r"default \(quality-clean\): int4g[\s\S]{0,80}?"
        r"([\d.]+) imgs/s =\s+(\d+) tok/s",
        readme,
    )
    assert m, "README default serving line not found"
    row = lad["7b_int4g_int4kv_b80_rows4_DEFAULT"]
    assert abs(row["value"] - float(m.group(1))) < 0.05
    assert abs(row["detail"]["tokens_per_sec"] - int(m.group(2))) < 2
    m = re.search(
        r"fast mode: flat int4 \+ W4A8[\s\S]{0,80}?"
        r"([\d.]+)\s+imgs/s =\s+(\d+) tok/s",
        readme,
    )
    assert m, "README fast-mode serving line not found"
    row = lad["7b_int4_int4kv_b80_rows4_w4a8_fastmode_r5confirm"]
    assert abs(row["value"] - float(m.group(1))) < 0.05
    assert abs(row["detail"]["tokens_per_sec"] - int(m.group(2))) < 2
    # the quality claims behind the flip
    qq = _load("QUANT_QUALITY_v2.json")
    assert qq["int4g_kv4"]["first_token_agreement"] == 1.0
    assert qq["headline"]["first_token_agreement"] < 1.0


def test_readme_13b_serving_matches_artifact():
    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"llava-13b: ([\d.]+) imgs/s at batch (\d+)", readme)
    assert m, "README 13B serving line not found"
    imgs, batch = float(m.group(1)), int(m.group(2))
    art = _load("BENCH_13B.json")
    best = art if isinstance(art, dict) else None
    assert best is not None
    txt = json.dumps(art)
    assert str(batch) in txt
    assert f"{imgs}" in txt or abs(
        float(re.search(r'"value": ([\d.]+)', txt).group(1)) - imgs
    ) < 0.05


def test_quant_quality_claims_match_artifact():
    """README quotes int8-lossless / int4 top-1 levels; they must match
    the committed QUANT_QUALITY.json rows."""
    art = _load("QUANT_QUALITY.json")
    assert art["int8"]["top1_agreement"] >= 0.999
    readme = open(os.path.join(REPO, "README.md")).read()
    if "int4 top-1" in readme or "int4 weights" in readme:
        assert art["int4"]["top1_agreement"] >= 0.99


@pytest.mark.parametrize("doc", DOCS)
def test_docs_exist(doc):
    assert os.path.exists(os.path.join(REPO, doc)), doc
