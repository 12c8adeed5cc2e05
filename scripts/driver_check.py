"""Local imitation of the driver's correctness gate.

Runs every queries() entry at the given sf and, where oracle_sql() has an
entry, executes the SQL in DuckDB over the same parquet tables, then
compares row count, schema (column names) and values (rows sorted by all
columns, exact equality after the pipelines' own rounding).

Usage: python scripts/driver_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: engine raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows={len(mine)} (rows-only, no oracle) [{dt:.1f}s]")
            continue
        try:
            ref = normalize(con.sql(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL  {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            failures.append(name)
            continue
        if len(mine) != len(ref):
            print(f"FAIL  {name}: rows {len(mine)} != {len(ref)}")
            failures.append(name)
            continue
        mismatch = None
        for col in mine.columns:
            a, b = mine[col], ref[col]
            try:
                same = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                same = a.astype(str).values == b.astype(str).values
            if not same.all():
                import numpy as np

                bad = int(np.argmax(~same))
                mismatch = (col, bad, a.iloc[bad], b.iloc[bad])
                break
        if mismatch:
            col, i, av, bv = mismatch
            print(f"FAIL  {name}: col {col} row {i}: engine={av!r} oracle={bv!r}")
            failures.append(name)
        else:
            print(f"PASS  {name}: rows={len(mine)} [{dt:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
