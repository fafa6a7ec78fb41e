#!/usr/bin/env python3
"""Build BENCH_perq_r{N}.json from a graft.Bench full stdout line.

Usage: make_perq_artifact.py <bench_stdout_file> <round> [out_file]

Since r18 the bench emits compact summary lines INCREMENTALLY (one
per completed section plus heartbeats) with the full per-query line
second-to-last; this reads the LAST line carrying a per-query
`queries` MAP (compact lines have no such field) and reshapes it into
the per-round committed artifact format (round, reps, n_registered,
sf, total_sec, rep_totals, queries, sf1_x10_ratios, and — since
r16 — the smoke budget evidence: rotation, skipped, rotated_out).
"""
import json
import sys


def full_line(src: str) -> dict:
    full = None
    with open(src) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d.get("queries"), dict):
                full = d
    if full is None:
        sys.exit(f"no full per-query line found in {src} — the sweep "
                 "was likely killed before its final section")
    return full


def main() -> None:
    src, rnd = sys.argv[1], int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else f"BENCH_perq_r{rnd}.json"
    full = full_line(src)
    smoke = full.get("sf1_smoke", {})
    art = {
        "round": rnd,
        "reps": full["reps"],
        "n_registered": full["n_registered"],
        "sf": full["sf"],
        "total_sec": full["value"],
        "rep_totals": full["rep_totals"],
        "queries": {k: round(v, 6) for k, v in full["queries"].items()},
        "sf1_x10_ratios": {
            k: v["x10_ratio"] for k, v in smoke.get("queries", {}).items()
        },
        "sf1_smoke_rotation": smoke.get("rotation"),
        "sf1_smoke_skipped": smoke.get("skipped", []),
        "sf1_smoke_rotated_out": smoke.get("rotated_out", []),
        "failed": full.get("failed", []),
    }
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {out}: total {art['total_sec']:.1f}s over "
          f"{len(art['queries'])} queries, "
          f"{len(art['sf1_x10_ratios'])} smoke ratios, "
          f"{len(art['sf1_smoke_skipped'])} skipped")


if __name__ == "__main__":
    main()
