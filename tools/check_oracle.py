#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the oracle SQL in DuckDB over the same sf dir, compare
row counts, column names, and values (columns sorted by name, rows sorted).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        gcols = [c[0] for c in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(grows)} rows")
            continue
        want = con.execute(oracle[name])
        wcols = [c[0] for c in want.description]
        wrows = want.fetchall()
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        if gc != wc:
            print(f"[FAIL] {name}: columns {gc} != {wc}")
            failures += 1
        elif len(gr) != len(wr):
            print(f"[FAIL] {name}: rows {len(gr)} != {len(wr)}")
            failures += 1
        elif gr != wr:
            bad = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            print(f"[FAIL] {name}: value mismatch, first diffs: {bad}")
            failures += 1
        else:
            print(f"[ok] {name}: {len(gr)} rows match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
