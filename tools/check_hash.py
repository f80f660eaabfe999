#!/usr/bin/env python3
"""Strict replica of the suspected driver hash compare.

Usage: python3 tools/check_hash.py <sfDir> <verifyOutDir>

Unlike check_oracle.py (numeric compare), this emulates the failure
mode seen in CORRECTNESS_r01: the driver reads the Spark parquet via
pyarrow/pandas (DECIMAL -> decimal.Decimal objects) and the oracle via
duckdb fetchdf (DECIMAL -> float64), then hashes per-cell string
representations. A cell passes only if str(spark_cell) == str(duck_cell)
after this pipeline — which is what made '381532.0000' (Decimal) vs
'381532.0' (float) fail in round 1 despite numeric equality.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    # Emulate a naive str()-based hasher over pandas cells.
    if v is None:
        return "<null>"
    try:
        if v != v:  # NaN
            return "<null>"
    except ValueError:  # array-valued cell: elementwise compare is ambiguous
        return str(list(v))
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e).splitlines()[0]}")
            n_bad += 1
            continue
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_bad += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_bad += 1
            continue
        bad = None
        for c in want.columns:
            wv = [canon(x) for x in want[c]]
            gv = [canon(x) for x in got[c]]
            if wv != gv:
                i = next(i for i, (w, g) in enumerate(zip(wv, gv)) if w != g)
                bad = f"{c}[{i}]: want={wv[i]!r} got={gv[i]!r}"
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(want)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
