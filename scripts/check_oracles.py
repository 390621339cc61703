"""Local stand-in for the driver's correctness gate: run every
queries() entry and its oracle_sql() twin on the same sf dir, compare
row count, schema (column names), and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[ERR ] {name}: query raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"[rows] {name}: {len(mine)} rows (no oracle)")
            continue
        try:
            theirs = canon(con.execute(sqls[name]).df())
        except Exception as ex:
            print(f"[ERR ] {name}: oracle raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        ok_rows = len(mine) == len(theirs)
        ok_cols = list(mine.columns) == list(theirs.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                ok_vals = bool(
                    (mine.values == theirs.values).all()
                    if mine.select_dtypes("object").shape[1] == 0
                    else mine.equals(theirs)
                )
            except Exception:
                ok_vals = mine.equals(theirs)
        status = "OK  " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"[{status}] {name}: rows {len(mine)}/{len(theirs)} cols "
            f"{list(mine.columns)} vs {list(theirs.columns)} values={'ok' if ok_vals else 'MISMATCH'}"
        )
        if status == "FAIL":
            failures.append(name)
            merged = mine.compare(theirs) if (ok_rows and ok_cols) else None
            if merged is not None and len(merged):
                print(merged.head(10))
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
