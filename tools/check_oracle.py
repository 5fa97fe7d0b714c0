"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf, and for entries with
``oracle_sql()`` compares row count, column names and an
order-insensitive value hash against DuckDB — the same contract the
driver records in CORRECTNESS_r{N}.json.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> int:
    """Dtype-STRICT order-insensitive hash.

    The driver's compare is dtype-sensitive (DuckDB HUGEINT vs engine
    int64 hash differently even when values are equal), so this gate
    must be too: the dtype string of every column participates in the
    hash, and values are NOT normalized.  Round-1 lesson: Python
    ``hash(2.3e11) == hash(230000000000)`` masked exactly that class of
    driver failure.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    dtypes = tuple(str(df[c].dtype) for c in df.columns)
    rows = [tuple(r) for r in df.itertuples(index=False)]
    return hash((dtypes, frozenset((rows.count(r), r) for r in set(rows))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} cols={sorted(got.columns)} "
                  f"[rows-only] {dt:.1f}s")
            continue
        want = con.execute(oracles[name]).df()
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems:
            gd = {c: str(got[c].dtype) for c in got.columns}
            wd = {c: str(want[c].dtype) for c in want.columns}
            if gd != wd:
                problems.append(
                    "dtype mismatch: "
                    + "; ".join(f"{c}: got {gd[c]} want {wd[c]}"
                                for c in sorted(gd) if gd[c] != wd[c]))
        if not problems and value_hash(got.copy()) != value_hash(want.copy()):
            problems.append("value-hash mismatch")
            merged = got.reindex(sorted(got.columns), axis=1)
            wanted = want.reindex(sorted(want.columns), axis=1)
            key = sorted(got.columns)[0]
            gs = merged.sort_values(list(merged.columns)).reset_index(drop=True)
            ws = wanted.sort_values(list(wanted.columns)).reset_index(drop=True)
            diff = (gs != ws) & ~(gs.isna() & ws.isna())
            bad = diff.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                problems.append(f"first diff row {i}: got={gs.loc[i].to_dict()} "
                                f"want={ws.loc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: rows={len(got)} match {dt:.1f}s")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
