"""Merge freshly-measured quant-quality rows into the committed
QUANT_QUALITY.json.

The mode npz artifacts behind the committed report live in /tmp (wiped
between container sessions), so a later session can only re-measure the
modes it needs (e.g. the bf16 oracle + w4a8). Running
`quant_quality.py --report` then would REPLACE the committed report
with one containing only the re-run modes. This script instead runs the
report against whatever npz files exist and copies ONLY the named mode
rows into /root/repo/QUANT_QUALITY.json, leaving every other committed
row (and its provenance) intact.

Usage: python scripts/merge_qq.py w4a8 [more modes...]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QQ_DIR = os.environ.get("HALVA_QQ_DIR", "/tmp/halva_quant_quality")


def main():
    modes = sys.argv[1:]
    assert modes, "usage: merge_qq.py <mode> [mode...]"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/quant_quality.py"),
         "--report"],
        check=True,
    )
    with open(os.path.join(QQ_DIR, "report.json")) as f:
        fresh = json.load(f)
    target = os.path.join(REPO, "QUANT_QUALITY.json")
    with open(target) as f:
        committed = json.load(f)
    for m in modes:
        assert m in fresh, f"mode {m} not in fresh report ({list(fresh)})"
        assert not fresh[m].get("stale"), f"mode {m} is stale: {fresh[m]}"
        committed[m] = fresh[m]
        print(f"merged {m}: {json.dumps(fresh[m])}")
    with open(target, "w") as f:
        json.dump(committed, f, indent=2)
    print(f"wrote {target}")


if __name__ == "__main__":
    main()
