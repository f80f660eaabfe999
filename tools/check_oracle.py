#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every testdata table
as a DuckDB view over <sfDir>/*.parquet, runs each oracle, and
compares against the Spark result parquet at <verifyOutDir>/<name>/.
Columns are sorted by name before compare (as the driver does);
values compared exactly except floats (rtol 1e-9, to spot genuine
drift vs representation noise — the real driver hashes, so we WARN
on any float that is not bit-identical).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    try:
        import pandas as pd
        if not isinstance(v, (list, tuple)) and pd.isna(v):
            return None  # NaT and friends
    except (TypeError, ValueError):
        pass
    return v


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
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
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
            wv, gv = list(want[c]), list(got[c])
            for i, (w, g) in enumerate(zip(wv, gv)):
                w, g = norm(w), norm(g)
                if w is None and g is None:
                    continue
                # exact compare, including floats — the driver hashes
                # values, so any bit drift is a real failure
                eq = (w == g)
                if not eq:
                    bad = f"{c}[{i}]: want={w!r} got={g!r}"
                    break
            if bad:
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
