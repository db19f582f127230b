#!/usr/bin/env python3
"""Rewrite COVERAGE.md's generated-counts block from coverage_counts.json.

The counts are produced by `graft.Verify` straight from the SparkEntry
registry (the single source of truth), so the COVERAGE.md header can no
longer drift from the code the way the hand-maintained counts did in
rounds 7-10.

Usage: python3 dev/sync_coverage_header.py [counts_json]
  counts_json defaults to the most recent of /tmp/verify_*/coverage_counts.json
  if not given; pass the Verify outDir's file explicitly for determinism.
"""
import glob
import json
import os
import re
import sys

BEGIN = "<!-- BEGIN GENERATED COUNTS"
END = "<!-- END GENERATED COUNTS -->"
COVERAGE = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")


def wrap_names(names, width=72, indent=""):
    lines, cur = [], indent
    for i, n in enumerate(names):
        tok = n + ("," if i < len(names) - 1 else "")
        if cur != indent and len(cur) + 1 + len(tok) > width:
            lines.append(cur)
            cur = indent
        cur = tok if cur == indent else cur + " " + tok
    lines.append(cur)
    return "\n".join(lines)


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        cands = sorted(glob.glob("/tmp/verify_*/coverage_counts.json"),
                       key=os.path.getmtime)
        if not cands:
            sys.exit("no coverage_counts.json found; run graft.Verify first")
        path = cands[-1]
    with open(path) as f:
        c = json.load(f)
    block = (
        f"{BEGIN} (dev/sync_coverage_header.py; source = the SparkEntry\n"
        f"registry via Verify's coverage_counts.json — do not edit by hand) -->\n"
        f"Registry total: **{c['registry_total']} queries** — "
        f"**{c['oracle_full']} with DuckDB hash-match oracles** (dev/check.py\n"
        f"parity run at sf0.01), {c['rows_only']} rows-only by design\n"
        f"(hash-seed/partition/codebook-dependent; each with a ScalaTest\n"
        f"equivalence/recall/parity gate):\n"
        f"{wrap_names(c['rows_only_names'])}\n"
        f"{END}"
    )
    with open(COVERAGE) as f:
        text = f.read()
    if BEGIN in text:
        new = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block,
                     text, flags=re.S)
    else:
        sys.exit("COVERAGE.md has no generated-counts markers")
    with open(COVERAGE, "w") as f:
        f.write(new)
    print(f"COVERAGE.md counts synced from {path}: "
          f"{c['registry_total']} queries / {c['oracle_full']} oracles / "
          f"{c['rows_only']} rows-only")


if __name__ == "__main__":
    main()
