"""TPC-H breadth module: every query matches its DuckDB oracle at
sf0.001 (rows + columns + dtype-strict order-insensitive value hash —
the same contract the driver gate checks at sf0.01)."""

import duckdb
import pandas as pd
import pytest

from jsonschema_ray.pipelines.tpch import TPCH_ORACLE, TPCH_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


def _norm(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    dtypes = tuple(str(df[c].dtype) for c in df.columns)
    rows = sorted(map(tuple, df.itertuples(index=False)),
                  key=lambda r: tuple(map(str, r)))
    return dtypes, rows


@pytest.mark.parametrize("name", sorted(TPCH_QUERIES))
def test_tpch_query_matches_duckdb(ray_session, name):
    res = TPCH_QUERIES[name](SF_DIR)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    want = con.execute(TPCH_ORACLE[name]).df()
    con.close()

    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), name
    assert _norm(got) == _norm(want), name
