#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each parquet fixture under its
bare table name, runs each oracle in DuckDB, and compares against the Spark
result parquet at <verifyOutDir>/<name>/ — columns sorted by name, and every
cell compared on its CANONICAL SERIALIZED form (the driver hashes serialized
values, so a Decimal('123.40') vs float 123.4 difference is a hash mismatch
even when pandas value-compare says equal — that class of failure cost round 1
eight queries).
"""
import json, sys, glob, os, math
from decimal import Decimal
import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    """Serialize one cell the way a hash gate would see it: type-sensitive,
    scale-sensitive for decimals, bit-exact repr for floats."""
    if v is None:
        return "@NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "@NULL"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "@NULL" if math.isnan(f) else repr(f)
    if isinstance(v, Decimal):
        return "DEC:" + str(v)  # keeps scale: 123.40 != 123.4
    if isinstance(v, (bool, np.bool_)):
        return "B:" + str(bool(v))
    if isinstance(v, (int, np.integer)):
        return "I:" + str(int(v))
    if isinstance(v, pd.Timestamp):
        return "T:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "X:" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "@NULL"
    except (TypeError, ValueError):
        pass
    return "S:" + str(v)


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
            sv = [canon(v) for v in s[c]]
            ov = [canon(v) for v in o[c]]
            mism = [i for i, (a, b) in enumerate(zip(sv, ov)) if a != b]
            if mism:
                i = mism[0]
                bad.append(f"{c}: {len(mism)} hash-mismatches, first@{i}: {sv[i]!r} vs {ov[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_bad += 1
        else:
            print(f"OK   {name}: {len(s)} rows"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
