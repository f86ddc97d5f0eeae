#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against views over the sf parquet
tables, loads the corresponding Spark parquet output, sorts columns by name
(like the driver) plus rows by all columns, and compares values exactly.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            ocur = con.execute(sql)
            ocols = [d[0] for d in ocur.description]
            orows = ocur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            mcur = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            mcols = [d[0] for d in mcur.description]
            mrows = mcur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        oc, orows = canon(orows, ocols)
        mc, mrows = canon(mrows, mcols)
        if oc != mc:
            print(f"FAIL {name}: columns differ: spark={mc} oracle={oc}")
            n_fail += 1
            continue
        if len(orows) != len(mrows):
            print(f"FAIL {name}: row count spark={len(mrows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(mrows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mrows)} rows, {len(mc)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
