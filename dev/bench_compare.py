#!/usr/bin/env python3
"""Round-over-round bench regression gate — compares LIKE WITH LIKE.

The round-8 retro: full-96-query single-JVM runs inflated heavy queries
up to 3x vs isolated reruns, so cross-round per-query comparison was
noise-bound. BENCH_r9+ artifacts carry an "isolation" stamp
("fresh-jvm-batches" / "single-jvm"); this gate refuses to compare
artifacts with different stamps, and flags per-query ratios beyond the
threshold only on the common query set.

Usage: python3 dev/bench_compare.py OLD.json NEW.json [ratio=1.3]
Exit 1 if any common query regressed beyond the ratio.
"""
import json, sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(old_path, new_path, ratio=1.3):
    old, new = load(old_path), load(new_path)
    iso_old = old.get("isolation", "single-jvm")
    iso_new = new.get("isolation", "single-jvm")
    if iso_old != iso_new:
        print(f"NOT COMPARABLE: isolation {iso_old!r} vs {iso_new!r} — "
              "comparing a batched artifact against a single-JVM one "
              "re-creates the round-8 noise trap; rerun one side.")
        return 2
    if old.get("contended") or new.get("contended"):
        print("WARNING: a side is stamped contended=true — box noise, "
              "ratios below are advisory only")
    cq = set(old.get("contended_queries", [])) | set(new.get("contended_queries", []))
    if cq:
        print(f"WARNING: {len(cq)} queries were measured in a batch that stayed "
              "contended after retries — their ratios are advisory: "
              + ", ".join(sorted(cq)))
    for side, art in (("old", old), ("new", new)):
        fs = art.get("floor_skipped", [])
        if fs:
            print(f"NOTE: {side} artifact skipped {len(fs)} isolated floors "
                  f"(wall-clock budget): {', '.join(fs)} — regression hunts on "
                  "those queries lack a quiet-box floor this round")
        # flag in-batch readings far above their recorded quiet floor: box
        # state, not code — isolate before chasing (the r12-r14 st04 class)
        floors = art.get("isolated_floor", {})
        hot = [(q, art["queries"][q], f) for q, f in floors.items()
               if q in art.get("queries", {}) and f > 0 and art["queries"][q] / f > 1.5]
        if hot:
            print(f"NOTE: {side} in-batch readings ≥1.5x their own isolated "
                  "floor (box state, not code): "
                  + ", ".join(f"{q} {v:.2f}s vs floor {f:.2f}s" for q, v, f in hot))
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    regressed = []
    for q in common:
        if qo[q] <= 0:
            continue
        r = qn[q] / qo[q]
        # sub-threshold absolute deltas are JVM jitter even isolated:
        # a 0.10s -> 0.16s "1.6x" on a trivial query is not a regression
        if r > ratio and (qn[q] - qo[q]) > 0.3:
            regressed.append((q, qo[q], qn[q], r))
    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    print(f"common {len(common)} queries: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)  [isolation={iso_new}]")
    if only_old:
        print(f"dropped since old: {', '.join(only_old)}")
    if only_new:
        print(f"new since old: {', '.join(only_new)}")
    for q, a, b, r in sorted(regressed, key=lambda t: -t[3]):
        print(f"REGRESSED {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    if not regressed:
        print("no per-query regressions beyond "
              f"{ratio}x (+0.3s absolute floor)")
    return 1 if regressed else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sys.exit(main(args[0], args[1], float(args[2]) if len(args) > 2 else 1.3))
