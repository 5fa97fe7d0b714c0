"""Synthesized-partsupp TPC-H completions (Q2/Q9/Q11/Q16/Q20): the Ray
pipelines match their DuckDB oracles at sf0.001 AND sf0.01 under the
driver's dtype-strict order-insensitive contract, and the Python
generator is bit-identical to the oracle's SQL CTE twin."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from jsonschema_ray.pipelines.queries import ORACLE, QUERIES
from jsonschema_ray.pipelines.tpch_partsupp import (
    PARTSUPP_QUERIES, _ps_expand)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


def _norm(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    dtypes = tuple(str(df[c].dtype) for c in df.columns)
    rows = sorted(map(tuple, df.itertuples(index=False)),
                  key=lambda r: tuple(map(str, r)))
    return dtypes, rows


@pytest.mark.parametrize("name", sorted(PARTSUPP_QUERIES))
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_partsupp_query_matches_duckdb(ray_session, name, sf_dir):
    res = QUERIES[name](sf_dir)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = con.execute(ORACLE[name]).df()
    con.close()

    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), name
    assert _norm(got) == _norm(want), name


@pytest.mark.parametrize("cnt", [10, 100, 1000])
def test_generator_matches_sql_cte(cnt):
    """The numpy expansion and the oracle CTE produce the identical
    partsupp multiset for every supplier count the corpus family ships,
    and the four suppkeys per part are distinct."""
    pk = np.arange(0, 500, dtype=np.int64)
    step = cnt // 4 + 1
    sk, avail, cost = _ps_expand(pk, cnt, step)
    assert all(len(set(row)) == 4 for row in sk), "suppkey collision"
    got = pd.DataFrame({
        "ps_partkey": np.repeat(pk, 4), "ps_suppkey": sk.ravel(),
        "ps_availqty": avail.ravel(), "ps_supplycost_c": cost.ravel()})

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE part AS SELECT unnest(range(0, 500)) AS p_partkey")
    want = con.execute(f"""
WITH ps0 AS (
    SELECT p_partkey AS ps_partkey,
           (p_partkey + i.i * ({cnt} // 4 + 1)) % {cnt} AS ps_suppkey
    FROM part, generate_series(0, 3) AS i(i))
SELECT *,
       (ps_partkey * 7   + ps_suppkey * 13) % 9999  + 1 AS ps_availqty,
       (ps_partkey * 131 + ps_suppkey * 17) % 99901 + 100
           AS ps_supplycost_c
FROM ps0""").df()
    con.close()

    key = ["ps_partkey", "ps_suppkey"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(g[w.columns], w)
