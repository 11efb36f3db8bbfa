#!/usr/bin/env python3
"""Driver-EMULATING pre-flight, stricter than selfcheck.py.

Differences from selfcheck.py, matching what cost round 7 two queries:
  * Spark side loads via pandas.read_parquet (pyarrow) — parquet DECIMAL
    columns stay `decimal.Decimal` objects, exactly as the driver sees them.
  * Oracle side loads via duckdb `.df()` — DECIMAL columns become float64
    there. A decimal-typed OUTPUT column therefore hash-mismatches even when
    values are equal (q_cov_matrix, round 7).
  * Rows are sorted by all columns (sorted column-name order) before the
    cell compare — an array/list output column makes this sort THROW in
    pandas, which is a driver-side `err` (q_vec_pool, round 7).

Usage: python3 tools/drivercheck.py <sfDir> <verifyOutDir> [name...]
"""
import json, sys, os, math
from decimal import Decimal
import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
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
        return "DEC:" + str(v)
    if isinstance(v, (bool, np.bool_)):
        return "B:" + str(bool(v))
    if isinstance(v, (int, np.integer)):
        return "I:" + str(int(v))
    if isinstance(v, pd.Timestamp):
        return "T:" + v.isoformat()
    # datetime.date (pyarrow DATE) vs pd.Timestamp-at-midnight (duckdb DATE
    # via .df()) are the SAME value to the driver (its r7 run passed 8 such
    # queries) — normalize date to the midnight-timestamp form
    import datetime
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return "T:" + datetime.datetime(v.year, v.month, v.day).isoformat()
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


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"FAIL {name}: no spark result dir"); n_bad += 1; continue
        try:
            s = pd.read_parquet(d)          # pyarrow: decimals stay Decimal
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}"); n_bad += 1; continue
        try:
            o = con.execute(sql).df()       # duckdb: decimals become float64
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        s = s[sorted(s.columns)]
        o = o[sorted(o.columns)]
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}"); n_bad += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_bad += 1; continue
        try:
            cols = list(s.columns)
            s = s.sort_values(cols, kind="mergesort").reset_index(drop=True)
            o = o.sort_values(cols, kind="mergesort").reset_index(drop=True)
        except Exception as e:
            print(f"FAIL {name}: row-sort error (array column?): {e}"); n_bad += 1; continue
        bad = []
        for c in s.columns:
            sv = [canon(v) for v in s[c]]
            ov = [canon(v) for v in o[c]]
            mism = [i for i, (a, b) in enumerate(zip(sv, ov)) if a != b]
            if mism:
                i = mism[0]
                bad.append(f"{c}: {len(mism)} mism, first@{i}: {sv[i]!r} vs {ov[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3])); n_bad += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
