#!/usr/bin/env python3
"""Splice the 64g run's two_level_5m field into the canonical 8g artifact.

Usage: merge_scalebench.py [SF1_JSON] [G64_JSON]

The split-JVM protocol (PLANS.md round-17) runs the 5M ANN measurement in
its own 64g build-class JVM, writing SCALEBENCH_sf1_64g.json, while the
canonical SCALEBENCH_sf1.json carries 8g-heap sweeps. ScaleBench's 8g run
performs this merge itself at artifact-write time; this tool re-performs
it WITHOUT re-running the ~1.5 h sweep when only the 64g field changed
(round 18: the 5M seed sweep lands draws incrementally over hours after
the 8g sweep has finished). Unlike the in-code substring splice, this is
a full JSON round-trip — it fails loudly on malformed input by parsing.

Output ordering matches the in-code merge (round-18 ADVICE): the
two_level_5m field is reinserted in the Scala emitter's position —
immediately before "queries" — so a tool-merged artifact diffs against
an in-code-merged one field-for-field. Float FORMATTING may still
differ (json.dump repr vs the emitter's %.3f); a "did only the 64g
field change" check should diff parsed values, not bytes.
"""
import json
import sys

JVM_NOTE = (
    "merged from SCALEBENCH_sf1_64g.json (its own 64g build-class JVM; "
    "this file's sweeps ran at the 8g serving heap - a 64g local JVM "
    "inflates allocation-heavy sweep queries 2-3x, see PLANS.md round-17)")


def main() -> None:
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/SCALEBENCH_sf1.json"
    g64_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/SCALEBENCH_sf1_64g.json"
    sf1 = json.load(open(sf1_path))
    g64 = json.load(open(g64_path))
    if "two_level_5m" not in g64:
        sys.exit(f"{g64_path}: no two_level_5m field - nothing to merge")
    # legacy "sec" normalizes IN PLACE (the in-code merge string-replaces
    # the key, preserving position — pop/append would move the field to
    # the end and break the field-for-field parity this tool promises)
    field = {("build_plus_serve_sec" if k == "sec" else k): v
             for k, v in g64["two_level_5m"].items()}
    field["jvm"] = JVM_NOTE
    # Reinsert in the Scala emitter's canonical position (immediately
    # before "queries") rather than appending at the end — dict insert
    # order is JSON output order, and a field that wanders corrupts
    # cross-artifact diffs (round-18 ADVICE).
    merged = {}
    for k, v in sf1.items():
        if k == "two_level_5m":
            continue  # re-placed below
        if k == "queries":
            merged["two_level_5m"] = field
        merged[k] = v
    if "two_level_5m" not in merged:  # no "queries" key — append
        merged["two_level_5m"] = field
    sf1 = merged
    with open(sf1_path, "w") as f:
        json.dump(sf1, f)
        f.write("\n")
    print(f"{sf1_path}: two_level_5m <- {g64_path} "
          f"(commit {field.get('commit', '?')}, "
          f"recall_seeds_min {field.get('recall_seeds_min', '?')})")


if __name__ == "__main__":
    main()
