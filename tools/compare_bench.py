#!/usr/bin/env python3
"""Persist the FULL per-query bench map as a committed artifact and
diff it against the previous round's.

Why (VERDICT r12 #1): the driver's BENCH_r{N}.json keeps only a
~2,000-char stdout tail, so per-query timings were lost every round —
a 123-second total swing in r12 was unattributable from artifacts
alone and cost a full r11 rebuild to adjudicate. This script closes
that hole:

  1. reads a `graft.Bench` stdout capture (the FIRST JSON line holds
     the complete {"queries": {name: seconds, ...}} map),
  2. writes it to BENCH_perq_r<N>.json (committed, one per round),
  3. compares shared queries against the newest earlier
     BENCH_perq_r<M>.json and prints `regressed` (ratio > --threshold,
     default 1.5x, and absolute delta > --min-delta, default 0.3 s —
     sub-second noise on near-zero queries is not a regression) and
     `improved` lists plus the total delta.

Usage:
  python3 tools/compare_bench.py <bench-stdout-file> [--round N]
      [--threshold 1.5] [--min-delta 0.3]

Round defaults to (newest committed BENCH_perq/BENCH round) + 1 when
writing a new artifact, or re-uses --round to overwrite the current
round's map after a re-run. Exit code 0 always (the list is evidence
for the human/builder to adjudicate, not a gate that blocks on a
noisy box).
"""
import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def round_of(path):
    m = re.search(r"_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def newest_round(pattern):
    rs = [round_of(p) for p in glob.glob(os.path.join(ROOT, pattern))]
    rs = [r for r in rs if r >= 0]
    return max(rs) if rs else None


def full_query_map(path):
    """The first stdout line whose JSON carries a queries OBJECT of
    numbers — the complete per-query map (the compact last line has
    no queries field)."""
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            q = d.get("queries")
            if isinstance(q, dict) and q and all(
                    isinstance(v, (int, float)) for v in q.values()):
                return d, q
    sys.exit(f"no full per-query bench line found in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_stdout")
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-delta", type=float, default=0.3)
    args = ap.parse_args()

    d, queries = full_query_map(args.bench_stdout)
    rnd = args.round
    if rnd is None:
        prev_perq = newest_round("BENCH_perq_r*.json")
        prev_drv = newest_round("BENCH_r*.json")
        rnd = max([r for r in (prev_perq, prev_drv) if r is not None],
                  default=0) + 1

    out = {
        "round": rnd,
        "total_sec": d.get("value"),
        "reps": d.get("reps"),
        "n_registered": d.get("n_registered"),
        "sf": d.get("sf"),
        "queries": {k: round(float(v), 4)
                    for k, v in sorted(queries.items())},
    }
    if isinstance(d.get("sf1_smoke"), dict):
        sm = d["sf1_smoke"].get("queries", {})
        out["sf1_x10_ratios"] = {
            k: v.get("x10_ratio") for k, v in sorted(sm.items())
            if isinstance(v, dict)}
    out_path = os.path.join(ROOT, f"BENCH_perq_r{rnd}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {os.path.basename(out_path)} "
          f"({len(queries)} queries, total {out['total_sec']} s)")

    prev_rounds = sorted(r for r in
                         (round_of(p) for p in
                          glob.glob(os.path.join(ROOT, "BENCH_perq_r*.json")))
                         if 0 <= r < rnd)
    if not prev_rounds:
        print("no earlier BENCH_perq artifact — nothing to compare "
              "(the comparator starts paying off next round)")
        return
    prev_path = os.path.join(ROOT, f"BENCH_perq_r{prev_rounds[-1]}.json")
    with open(prev_path) as f:
        prev = json.load(f)
    pq = prev.get("queries", {})
    shared = sorted(set(pq) & set(queries))
    regressed, improved = [], []
    for k in shared:
        a, b = float(pq[k]), float(queries[k])
        if a <= 0:
            continue
        ratio = b / a
        if ratio > args.threshold and b - a > args.min_delta:
            regressed.append((k, a, b, ratio))
        elif ratio < 1 / args.threshold and a - b > args.min_delta:
            improved.append((k, a, b, ratio))
    tot_prev = sum(float(pq[k]) for k in shared)
    tot_now = sum(float(queries[k]) for k in shared)
    print(f"vs r{prev['round']}: {len(shared)} shared queries, "
          f"total {tot_prev:.2f} -> {tot_now:.2f} s "
          f"({tot_now / tot_prev:.2f}x)"
          if tot_prev else "vs previous: no shared queries")
    new_qs = sorted(set(queries) - set(pq))
    if new_qs:
        tot_new = sum(float(queries[k]) for k in new_qs)
        print(f"new queries this round: {len(new_qs)} "
              f"({tot_new:.2f} s): {', '.join(new_qs)}")
    print(f"regressed (> {args.threshold}x and > {args.min_delta}s): "
          + (", ".join(f"{k} {a:.2f}->{b:.2f}s ({r:.2f}x)"
                       for k, a, b, r in
                       sorted(regressed, key=lambda t: -t[3]))
             or "none"))
    if improved:
        print("improved: " + ", ".join(
            f"{k} {a:.2f}->{b:.2f}s ({r:.2f}x)"
            for k, a, b, r in sorted(improved, key=lambda t: t[3])))


if __name__ == "__main__":
    main()
