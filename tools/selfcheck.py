#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each parquet fixture under its
bare table name, runs each oracle in DuckDB, and compares against the Spark
result parquet at <verifyOutDir>/<name>/ — columns sorted by name, values
compared exactly (with a tiny float tolerance report so FP issues are visible
before the driver sees them).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_result(con, d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    return con.execute(f"SELECT * FROM read_parquet({files!r})").df()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_df = load_result(con, f"{out_dir}/{name}")
        if spark_df is None:
            print(f"FAIL {name}: no spark result parquet"); n_bad += 1; continue
        try:
            ora_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        s = spark_df[sorted(spark_df.columns)]
        o = ora_df[sorted(ora_df.columns)]
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}"); n_bad += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_bad += 1; continue
        bad = []
        for c in s.columns:
            sv, ov = s[c].reset_index(drop=True), o[c].reset_index(drop=True)
            if str(sv.dtype).startswith("float") or str(ov.dtype).startswith("float"):
                import numpy as np
                eq = (sv.isna() & ov.isna()) | (sv == ov)
                if not eq.all():
                    mism = (~eq).sum()
                    mx = (sv - ov).abs().max()
                    bad.append(f"{c}: {mism} float mismatches, maxdiff={mx}")
            else:
                eq = (sv.isna() & ov.isna()) | (sv.astype(object) == ov.astype(object))
                if not eq.all():
                    i = (~eq).idxmax()
                    bad.append(f"{c}: {( ~eq).sum()} mismatches, first@{i}: {sv[i]!r} vs {ov[i]!r}")
        dt = [f"{c}:{s[c].dtype}/{o[c].dtype}" for c in s.columns if str(s[c].dtype) != str(o[c].dtype)]
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_bad += 1
        else:
            note = f" [dtype-diff {dt}]" if dt else ""
            print(f"OK   {name}: {len(s)} rows{note}"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
