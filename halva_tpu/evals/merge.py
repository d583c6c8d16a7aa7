"""Merge chunked answer files (the reference's eval_hall/amber/merge.py +
the shell `cat` steps in src/evaluate_hall/*.sh fanout pipelines).

    python -m halva_tpu.evals.merge out/chunk*.jsonl -o merged.jsonl
"""

from __future__ import annotations

import argparse
import json
from typing import List


def merge_jsonl(paths: List[str], out_path: str, sort_key: str = None):
    rows = []
    for p in paths:
        with open(p) as f:
            rows.extend(json.loads(l) for l in f if l.strip())
    if sort_key:
        rows.sort(key=lambda r: r.get(sort_key))
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return len(rows)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--sort-key", default=None)
    args = p.parse_args(argv)
    n = merge_jsonl(args.inputs, args.output, args.sort_key)
    print(f"merged {n} rows from {len(args.inputs)} files")


if __name__ == "__main__":
    main()
