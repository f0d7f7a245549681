"""Local mimic of the driver's correctness gate: run every queries() entry at
a given sf_dir, run the matching oracle_sql() in DuckDB over the same parquet
tables, and compare row count, sorted column names, and values (rows sorted,
floats to 9 significant digits). Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, ".")
import __ray_entry__ as entrymod  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if isinstance(dt, pd.api.extensions.ExtensionDtype):
            df[c] = df[c].astype(object).astype(str)
        elif dt == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(dt, np.floating):
            df[c] = df[c].round(9)
        elif str(dt).startswith("datetime"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} cols={sorted(mine.columns)} ({dt:.1f}s, rows-only)")
            continue
        gold = con.sql(oracles[name]).df()
        a, b = canon(mine), canon(gold)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols mine={list(a.columns)} oracle={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows mine={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-8, atol=1e-10)
            print(f"ok   {name}: rows={len(a)} ({dt:.1f}s, value-match)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:300]}")
            n_fail += 1
    ray.shutdown()
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
