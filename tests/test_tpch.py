"""TPC-H breadth module: every query matches its DuckDB oracle at
sf0.001 (rows + columns + dtype-strict order-insensitive value hash —
the same contract the driver gate checks at sf0.01)."""

import duckdb
import pandas as pd
import pytest

from jsonschema_ray.pipelines.queries import ORACLE, QUERIES
from jsonschema_ray.pipelines.tpch import TPCH_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]
# the full 17-query suite: the 12 in pipelines/tpch.py plus the 5
# older ones registered directly in pipelines/queries.py
ALL_TPCH = sorted(TPCH_QUERIES) + [
    "q1_pricing_summary", "q3_top_orders", "q5_local_supplier_volume",
    "q10_returned_items", "q18_large_orders"]


def _norm(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    dtypes = tuple(str(df[c].dtype) for c in df.columns)
    rows = sorted(map(tuple, df.itertuples(index=False)),
                  key=lambda r: tuple(map(str, r)))
    return dtypes, rows


@pytest.mark.parametrize("name", ALL_TPCH)
def test_tpch_query_matches_duckdb(ray_session, name):
    res = QUERIES[name](SF_DIR)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    want = con.execute(ORACLE[name]).df()
    con.close()

    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), name
    assert _norm(got) == _norm(want), name


def test_q18_distributed_fallback_matches_broadcast(ray_session,
                                                    monkeypatch):
    """Round-5 rework: q18's survivor attribution has two tiers
    (broadcast okey set vs distributed hash_join). The sf corpora
    never cross _Q18_BROADCAST_MAX, so force the join tier and pin it
    to the broadcast tier's rows."""
    import jsonschema_ray.pipelines.queries as Q

    base = Q.q_q18_large_orders(SF_DIR)
    base_df = base if isinstance(base, pd.DataFrame) else base.to_pandas()
    monkeypatch.setattr(Q, "_Q18_BROADCAST_MAX", 0)
    forced = Q.q_q18_large_orders(SF_DIR)
    forced_df = forced if isinstance(forced, pd.DataFrame) \
        else forced.to_pandas()
    assert len(forced_df) == len(base_df)
    assert sorted(forced_df.columns) == sorted(base_df.columns)
    assert _norm(forced_df) == _norm(base_df)
