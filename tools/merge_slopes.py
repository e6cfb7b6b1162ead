#!/usr/bin/env python3
"""Merge a SLOPE_ONLY run's thirty_x entries into the canonical artifact.

Usage: merge_slopes.py [SF1_JSON] [SLOPE_JSON]

The 30x slope protocol (PLANS.md round-18) computes each ratio as a
same-phase quotient: sf0.1 re-timed immediately beside the sf3 runs.
That quotient needs NO data from the ~1.5 h full 8g sweep, so a
SLOPE_ONLY run (SPARK_GRAFT_SLOPE_ONLY=q_a,q_b) measures just the named
queries and this tool splices the entries into SCALEBENCH_sf1.json's
thirty_x map in place (adding or replacing by name, order preserved,
new names appended in the slope run's order).

The two display-only fields that DO come from a sweep — sf01_sweep_sec
and the 10x point (sf1_sec, ratio10) — are backfilled from the
committed artifact's own `queries` map for that name, i.e. the most
recent full-sweep measurement of the same tree family; a name absent
from the queries map carries only the same-phase fields. Everything
graded (sf01_sec, sf3_sec, ratio30, the run arrays) comes from the
slope run itself.

Full JSON round-trip (fails loudly on malformed input), same policy as
merge_scalebench.py; copies mismatch between the two files is an error
(a 30x entry under a different staging would not be comparable).
"""
import json
import sys


def main() -> None:
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/SCALEBENCH_sf1.json"
    slope_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/SCALEBENCH_slope_only.json"
    sf1 = json.load(open(sf1_path))
    slope = json.load(open(slope_path))
    if slope.get("metric") != "slope_only":
        sys.exit(f"{slope_path}: metric is not 'slope_only'")
    new = slope.get("thirty_x")
    if not isinstance(new, dict) or not new:
        sys.exit(f"{slope_path}: no thirty_x entries to merge")
    tx = sf1.get("thirty_x")
    if not isinstance(tx, dict):
        sys.exit(f"{sf1_path}: no thirty_x map to merge into")
    if "copies" in new and new["copies"] != tx.get("copies"):
        sys.exit(f"copies mismatch: {sf1_path} thirty_x.copies="
                 f"{tx.get('copies')} vs {slope_path} {new['copies']}")
    # src identity, same hard requirement as every other carry path
    # (parseCarriedSingleton, runAnn5mCanary): a 30x point measured on a
    # different source corpus must not splice in silently.
    if slope.get("src") != sf1.get("src"):
        sys.exit(f"src mismatch: {sf1_path} src={sf1.get('src')} vs "
                 f"{slope_path} src={slope.get('src')}")
    queries = sf1.get("queries", {})
    merged_names = []
    for name, entry in new.items():
        if name == "copies":
            continue
        q = queries.get(name)
        if q and "sf01_sec" in q and "sf1_sec" in q:
            entry = dict(entry)
            entry["sf01_sweep_sec"] = q["sf01_sec"]
            entry["sf1_sec"] = q["sf1_sec"]
            entry["ratio10"] = round(q["sf1_sec"] / q["sf01_sec"], 3)
        tx[name] = entry
        merged_names.append(name)
    with open(sf1_path, "w") as f:
        json.dump(sf1, f)
        f.write("\n")
    print(f"{sf1_path}: thirty_x <- {slope_path} ({', '.join(merged_names)})")


if __name__ == "__main__":
    main()
