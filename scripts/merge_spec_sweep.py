"""Synthesize SPEC_ONCHIP.json from the queue-C speculative sweep.

Inputs (produced by scripts/chip_queue_r5c.sh on the real chip, all at
the headline serving config — b80, int4 weights, int4 prompt KV, rows4,
W4A8):
  /tmp/chipq5/spec_k{2,4,8}.json  — bench.py with HALVA_BENCH_SPEC=K
  /tmp/chipq5/bench_headline.json — plain greedy bench (queue A)

Derived quantities, because the synthetic bench's acceptance is an
UPPER bound (random-weight models emit cyclic text — best case for
prompt lookup):
  - verify_cost_ratio r = (plain decode steps/s) / (verify steps/s):
    weight-INDEPENDENT. A workload with realized acceptance A tokens
    per verify step speeds up by A / r — speculation pays iff A > r.
  - realized acceptance on the bench text per K (emitted/steps).

    python scripts/merge_spec_sweep.py [--q /tmp/chipq5] > SPEC_ONCHIP.json
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", default="/tmp/chipq5")
    args = ap.parse_args()

    with open(os.path.join(args.q, "bench_headline.json")) as f:
        plain = json.load(f)
    d = plain["details"]
    batch, tokens = d["batch"], d["decode_tokens"]
    # plain per-token step time: step_time_s covers `tokens` decode
    # steps plus one prefill; the spec runs pay the same prefill, so
    # compare at the whole-program level AND per-iteration level
    plain_wall = d["step_time_s"]

    sweep = {}
    for k in (2, 4, 8):
        p = os.path.join(args.q, f"spec_k{k}.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            row = json.load(f)
        sd = row["details"]
        sp = sd["speculative"]
        steps = sp["verify_steps"]
        emitted = sp["emitted_tokens"]
        accept = emitted / max(1, steps) / batch
        wall = sd["step_time_s"]
        # r: how many plain decode steps one verify step costs. Both
        # walls include one prefill of the same shape; subtract using
        # the plain per-step time as the unit.
        plain_per_step = plain_wall / tokens  # incl. amortized prefill
        verify_per_step = wall / max(1, steps)
        sweep[f"k{k}"] = {
            "imgs_per_sec": row["value"],
            "wall_s": wall,
            "verify_steps": steps,
            "tokens_per_verify_step_per_row": round(accept, 3),
            "verify_cost_in_plain_steps": round(
                verify_per_step / plain_per_step, 3
            ),
            "speedup_vs_plain": round(plain_wall / wall, 3),
        }

    out = {
        "metric": "speculative_sweep_onchip",
        "config": (
            f"b{batch} int4 weights + int4 prompt KV, rows4, W4A8, "
            f"{tokens} tokens/row, real v5e via relay"
        ),
        "plain": {
            "imgs_per_sec": plain["value"],
            "wall_s": plain_wall,
        },
        "sweep": sweep,
        "reading": (
            "speculation pays iff realized acceptance A (tokens per "
            "verify step) exceeds verify_cost_in_plain_steps r; the "
            "bench's cyclic synthetic text gives an UPPER-bound A — "
            "real caption acceptance (prompt-lookup literature, arXiv "
            "2402.01528: ~2-3x on summarization/repeat-rich text) "
            "must clear the same r"
        ),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
