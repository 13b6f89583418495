#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dir
written by graft.Verify, run the matching oracle SQL in DuckDB over the
same parquet tables and compare values with columns sorted by name.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    # Dtype-STRICT normalization: the driver hashes pandas values as-is,
    # so int64 1000 vs float64 1000.0 is a hash MISMATCH there. Tag each
    # value with its type class so Python's 1000 == 1000.0 can't mask
    # the skew (DuckDB HUGEINT -> float64 was exactly that, round 1).
    def norm(v):
        if v is None:
            return ("null",)
        if type(v).__name__ == "ndarray":  # before .item(): arrays have it too
            return ("a", tuple(norm(x) for x in v))
        if hasattr(v, "item"):  # numpy scalar -> python
            v = v.item()
        if isinstance(v, float):
            if math.isnan(v):
                return ("null",)
            return ("f", round(v, 9))
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            return ("i", v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return ("a", tuple(norm(x) for x in v))
        return ("s", str(v))

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failed.append(name)
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failed.append(name)
            continue
        # The REAL driver sorts rows with pandas sort_values, which
        # throws `unhashable type: numpy.ndarray` on array cells before
        # any comparison. Round 7 shipped three array-returning entries
        # because this local stand-in silently normalized them — now an
        # array/list cell in the spark output is a hard FAIL here too.
        arr_cols = [c for c in got.columns if len(got) > 0 and any(
            type(v).__name__ == "ndarray" or isinstance(v, (list, tuple))
            for v in got[c].head(5))]
        if arr_cols:
            print(f"FAIL {name}: array-typed output columns {arr_cols} "
                  "(driver's sort_values would die) — flatten to scalars")
            failed.append(name)
            continue
        g_cols, w_cols = sorted(got.columns), sorted(want.columns)
        if g_cols != w_cols:
            print(f"FAIL {name}: columns {g_cols} != {w_cols}")
            failed.append(name)
            continue
        g, w = canon(got), canon(want)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failed.append(name)
            continue
        if g != w:
            if sorted(map(repr, g)) == sorted(map(repr, w)):
                print(f"WARN {name}: values match but ROW ORDER differs")
                failed.append(name)
            else:
                bad = next(i for i in range(len(g)) if g[i] != w[i])
                print(f"FAIL {name}: first diff at row {bad}:")
                print(f"  spark:  {g[bad]}")
                print(f"  duckdb: {w[bad]}")
                failed.append(name)
            continue
        print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
