#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares: row count, column names
(sorted), RESULT TYPES (DuckDB DESCRIBE on both sides — the driver's
hash is type-sensitive, so a DuckDB HUGEINT sum vs a Spark BIGINT is a
red row even when every value matches), and values (rows sorted,
columns sorted by name).

Dev-only tool for fast iteration; the real gate is driver-side.
"""
import json
import sys
import glob
import os

import duckdb


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def norm(v):
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return round(v, 9)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')"
        )
        got_cols = [c[0] for c in got_rel.description]
        got = canon(got_rel.fetchall(), got_cols)
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(got)} "
                  f"{'OK' if len(got) > 0 else 'EMPTY-FAIL'}")
            continue
        try:
            want_rel = con.execute(oracles[name])
            want_cols = [c[0] for c in want_rel.description]
            want = canon(want_rel.fetchall(), want_cols)
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"[FAIL] {name}: columns {sorted(got_cols)} != "
                  f"{sorted(want_cols)}")
            n_fail += 1
            continue
        got_types = dict((r[0], r[1]) for r in con.execute(
            "DESCRIBE SELECT * FROM "
            f"read_parquet('{d}/*.parquet')").fetchall())
        want_types = dict((r[0], r[1]) for r in con.execute(
            f"DESCRIBE {oracles[name]}").fetchall())
        type_bad = [(c, got_types.get(c), want_types.get(c))
                    for c in sorted(got_cols)
                    if got_types.get(c) != want_types.get(c)]
        if type_bad:
            print(f"[FAIL] {name}: result types differ "
                  "(driver hash is type-sensitive):")
            for c, g, w in type_bad:
                print(f"    {c}: spark={g} oracle={w}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = [(g, w) for g, w in zip(got, want) if g != w]
        if bad:
            print(f"[FAIL] {name}: {len(bad)} mismatched rows; first:")
            print("   got:", bad[0][0])
            print("  want:", bad[0][1])
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(got)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
