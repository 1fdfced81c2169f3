#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's output
parquet + oracle_sql.json, run each oracle in DuckDB over the fixture tables,
and compare row-by-row (column names sorted, rows sorted, exact match with a
float-string normalization). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet  # noqa: F401  (ensures pyarrow backend)
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: timestamps → ISO strings (µs), floats → repr, ints → int
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.floor("us").dt.strftime("%Y-%m-%d %H:%M:%S.%f").fillna("NULL")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "nan" if v is None or (isinstance(v, float) and math.isnan(v)) else repr(float(v)))
        else:
            def norm(v):
                try:
                    import numpy as np
                    if isinstance(v, np.ndarray):
                        v = v.tolist()
                except ImportError:
                    pass
                if isinstance(v, (list, tuple)):
                    return "[" + ",".join(str(x) for x in v) + "]"
                return str(v)
            out[c] = s.map(norm)
    r = pd.DataFrame(out)
    r = r.sort_values(by=list(r.columns), kind="mergesort").reset_index(drop=True)
    return r


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            n_fail += 1
            continue
        neq = (g != x)
        if neq.any().any():
            bad_cols = [c for c in g.columns if neq[c].any()]
            idx = neq.any(axis=1).idxmax()
            print(f"FAIL {name}: value mismatch cols={bad_cols} first at row {idx}:")
            print("  got:", g.loc[idx].to_dict())
            print("  exp:", x.loc[idx].to_dict())
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    # queries without oracles: just report row counts
    import os
    for entry in sorted(os.listdir(out_dir)):
        if entry.endswith(".json") or entry in oracles:
            continue
        try:
            n = len(pd.read_parquet(f"{out_dir}/{entry}"))
            print(f"INFO {entry}: {n} rows (no oracle)")
        except Exception as e:
            print(f"WARN {entry}: unreadable ({e})")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
