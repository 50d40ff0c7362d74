#!/usr/bin/env python3
"""Diff two bench_full.json files (or a driver BENCH_r*.json with a
parseable queries map) and report per-query regressions/improvements.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [threshold]

Compares medians when `query_stats` is present (falling back to the
plain `queries` map), prints queries whose time changed by more than
`threshold` x (default 1.5), and the headline fields side by side.
A one-shot outlier in OLD shows up here as an "improvement" — check
OLD's min/max before celebrating; that is exactly why the bench runs
3-run medians now.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    stats = d.get("query_stats")
    if stats:
        times = {k: v["med"] for k, v in stats.items()}
    else:
        times = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
    return d, times


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, old_t = load(old_path)
    new, new_t = load(new_path)

    for field in ("events_per_sec", "bulk_rows_per_sec", "value"):
        if field in old or field in new:
            print(f"{field:20s} {old.get(field, '-'):>12} -> "
                  f"{new.get(field, '-'):>12}")
    for side, d in (("old", old), ("new", new)):
        if d.get("recall"):
            print(f"recall[{side}]         "
                  + " ".join(f"{k.replace('s_ann_', '')}={v:.2f}"
                             for k, v in sorted(d["recall"].items())))

    shared = sorted(set(old_t) & set(new_t))
    moved = []
    for q in shared:
        o, n = old_t[q], new_t[q]
        if o <= 0 or n <= 0:
            continue
        ratio = n / o
        if ratio >= threshold or ratio <= 1 / threshold:
            moved.append((ratio, q, o, n))
    if moved:
        print(f"\nqueries changed >= {threshold}x "
              f"({len(moved)}/{len(shared)} shared):")
        for ratio, q, o, n in sorted(moved, reverse=True):
            tag = "REGRESSED" if ratio > 1 else "improved"
            print(f"  {q:34s} {o:8.2f}s -> {n:8.2f}s  ({ratio:5.2f}x {tag})")
    else:
        print(f"\nno query changed >= {threshold}x "
              f"({len(shared)} shared queries)")
    only_new = sorted(set(new_t) - set(old_t))
    if only_new:
        print("new queries: " + ", ".join(only_new))
    errs = new.get("errors")
    if errs:
        print(f"NEW RUN HAS ERRORS: {errs}")
        sys.exit(1)


if __name__ == "__main__":
    main()
