"""Local simulation of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side over a given sf dir, compare
row-count, column names, and values (order-insensitive).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> str:
    if len(ours) != len(oracle):
        return f"ROWS {len(ours)} vs {len(oracle)}"
    if sorted(ours.columns) != sorted(oracle.columns):
        return f"COLS {sorted(ours.columns)} vs {sorted(oracle.columns)}"
    a, b = canon(ours), canon(oracle)
    for c in a.columns:
        x, y = a[c], b[c]
        # dtype-KIND strict: the driver's value-hash distinguishes int64 from
        # float64 (331 vs 331.0) even when np.allclose passes — an int column
        # on one side and float on the other is a driver hash_match failure
        xi = np.issubdtype(x.dtype, np.integer)
        yi = np.issubdtype(y.dtype, np.integer)
        xf = np.issubdtype(x.dtype, np.floating)
        yf = np.issubdtype(y.dtype, np.floating)
        if (xi and yf) or (xf and yi):
            return f"DTYPE col={c} ours={x.dtype} oracle={y.dtype} (int/float kind mismatch)"
        if np.issubdtype(x.dtype, np.floating) or np.issubdtype(y.dtype, np.floating):
            xa = x.to_numpy(dtype="float64", na_value=np.nan)
            ya = y.to_numpy(dtype="float64", na_value=np.nan)
            if not np.allclose(xa, ya, rtol=1e-6, atol=1e-9, equal_nan=True):
                bad = np.where(~np.isclose(xa, ya, rtol=1e-6, atol=1e-9, equal_nan=True))[0][:5]
                return f"VALUES col={c} rows={bad.tolist()} ours={xa[bad]} oracle={ya[bad]}"
        else:
            if not x.equals(y):
                bad = np.where(x.to_numpy() != y.to_numpy())[0][:5]
                return f"VALUES col={c} rows={bad.tolist()} ours={x.iloc[bad].tolist()} oracle={y.iloc[bad].tolist()}"
        # dtype check (informational)
    return "OK"


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            ours = to_pandas(fn(SF))
        except Exception as e:  # noqa
            failures.append(name)
            print(f"{name:24s} QUERY ERROR: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(ours)} rows, cols={list(ours.columns)}")
            continue
        try:
            oracle = con.execute(oracles[name]).df()
        except Exception as e:  # noqa
            failures.append(name)
            print(f"{name:24s} ORACLE ERROR: {e}")
            continue
        verdict = compare(name, ours, oracle)
        status = "PASS" if verdict == "OK" else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{name:24s} {status} ({len(ours)} rows) {verdict if verdict != 'OK' else ''}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
