#!/usr/bin/env python3
"""Merge N Bench JSON artifacts into one clean min-of-all snapshot.

Usage: merge_bench.py OUT IN1 IN2 [IN3 ...]

Each input is a graft.Bench output line (one JSON object with a
`queries` map of per-query seconds and optional `errors`). The output
carries the per-query MIN across every input, the recomputed total,
and self-describing runs/protocol fields (the round-16 verdict's
cold-reader contract). Fails loudly if any input recorded errors or
the inputs' query sets disagree — a clean artifact must describe one
frozen tree, not a union of partial sweeps.
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit("usage: merge_bench.py OUT IN1 IN2 [IN3 ...]")
    out, ins = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in ins]
    for p, r in zip(ins, runs):
        # named validation instead of a raw KeyError traceback (r17
        # ADVICE): a hand-edited or truncated input should say which
        # file broke the contract, not dump a stack
        for key in ("queries", "sf"):
            if key not in r:
                sys.exit(f"{p}: missing required Bench field '{key}' - "
                         "not a graft.Bench output line")
        if not isinstance(r["queries"], dict) or not r["queries"]:
            sys.exit(f"{p}: 'queries' must be a non-empty per-query map")
        if r.get("errors"):
            sys.exit(f"{p}: recorded errors {r['errors']} - not a clean run")
    names = set(runs[0]["queries"])
    for p, r in zip(ins, runs):
        if set(r["queries"]) != names:
            sys.exit(f"{p}: query set differs from {ins[0]}")
    sfs = {r["sf"] for r in runs}
    if len(sfs) != 1:
        sys.exit(f"inputs disagree on sf: {sorted(sfs)}")
    merged = {n: round(min(r["queries"][n] for r in runs), 3)
              for n in sorted(names)}
    in_jvm = [int(r.get("runs", 1)) for r in runs]
    line = {
        "queries": merged,
        "sf": runs[0]["sf"],
        "runs": sum(in_jvm),
        "protocol": (
            f"per-query min over {len(ins)} independent Bench invocations"
            f" ({'+'.join(map(str, in_jvm))} in-JVM sweeps each, post"
            " warm-up) on the frozen final tree"),
        "metric": "total",
        "unit": "sec",
        "value": round(sum(merged.values()), 3),
    }
    with open(out, "w") as f:
        json.dump(line, f)
        f.write("\n")
    print(f"{out}: {len(merged)} queries, total {line['value']}s "
          f"from {len(ins)} invocations")


if __name__ == "__main__":
    main()
