"""Merge head/tail Maros-Meszaros corpus artifacts into one file.

A corpus run interrupted by a TPU-worker crash is resumed with --start N
into a second artifact; this stitches them, preferring the LATER record
for any problem present in both (the rerun is the healthy-device one),
and verifies completeness against the canonical ≤1000-dim problem list.

Usage: python scripts/merge_corpus_artifacts.py OUT HEAD TAIL [TAIL2 ...]
"""
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out, *parts = sys.argv[1:]
    from proxsuite_tpu.utils.maros_meszaros import problems_within

    names = problems_within(1000, 1000)
    by_name = {}
    for p in parts:
        with open(p) as f:
            for rec in json.load(f):
                by_name[rec["name"]] = rec  # later files win
    merged = [by_name[n] for n in names if n in by_name]
    missing = [n for n in names if n not in by_name]
    n_pass = sum(r["ok"] for r in merged)
    print(f"{len(merged)}/{len(names)} problems, {n_pass} pass; "
          f"missing: {missing}")
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", out)
    return 0 if not missing else 1


if __name__ == "__main__":
    sys.exit(main())
