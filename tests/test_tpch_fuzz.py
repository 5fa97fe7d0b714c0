"""Randomized differential fuzz for the TPC-H suite: synthesize tiny
random tables with the driver's exact schemas, run every query against
DuckDB on the same parquet. Covers the paths the sf ratchets can't:
empty date windows, absent brands/types, single-supplier orders,
negative balances, customers with zero qualifying orders."""

import datetime

import duckdb
import numpy as np
import pandas as pd
import pytest

from jsonschema_ray.pipelines.queries import ORACLE, QUERIES
from tests.test_tpch import ALL_TPCH, TABLES, _norm


def _write_corpus(tmp, rng, *, empty_windows: bool) -> str:
    n_li, n_ord, n_cust, n_part, n_supp = 300, 80, 30, 40, 8
    if empty_windows:
        # every date far outside the queries' 1996-1997 windows and
        # no 'R' returnflags / PROMO parts: exercises the all-empty
        # group/window paths of each query
        dates = pd.to_datetime(
            rng.integers(0, 200, n_ord), unit="D",
            origin=datetime.datetime(2002, 1, 1))
        ship = pd.to_datetime(
            rng.integers(0, 200, n_li), unit="D",
            origin=datetime.datetime(2002, 1, 1))
        flags = np.full(n_li, "N")
        types = np.full(n_part, "LARGE")
    else:
        dates = pd.to_datetime(
            rng.integers(0, 2000, n_ord), unit="D",
            origin=datetime.datetime(1995, 1, 1))
        ship = pd.to_datetime(
            rng.integers(0, 2000, n_li), unit="D",
            origin=datetime.datetime(1995, 1, 1))
        flags = rng.choice(["A", "N", "R"], n_li)
        types = rng.choice(["PROMO", "SMALL", "LARGE"], n_part)

    region = pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]})
    nation = pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32)})
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(1, n_supp + 1),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-900, 9000, n_supp), 2)})
    customer = pd.DataFrame({
        "c_custkey": np.arange(1, n_cust + 1),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["BUILDING", "MACHINERY", "HOUSEHOLD"], n_cust)})
    part = pd.DataFrame({
        "p_partkey": np.arange(1, n_part + 1),
        "p_name": [f"part {i}" for i in range(1, n_part + 1)],
        "p_brand": rng.choice(
            ["Brand#12", "Brand#23", "Brand#24", "Brand#9"], n_part),
        "p_type": types,
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2)})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, n_ord + 1),
        "o_custkey": rng.integers(1, n_cust + 1, n_ord),
        "o_orderstatus": rng.choice(["F", "O", "P"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": dates,
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"], n_ord)})
    lineitem = pd.DataFrame({
        "l_orderkey": rng.integers(1, n_ord + 1, n_li),
        "l_partkey": rng.integers(1, n_part + 1, n_li),
        "l_suppkey": rng.integers(1, n_supp + 1, n_li),
        "l_linenumber": np.arange(n_li, dtype=np.int32) % 7 + 1,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": flags,
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": ship})
    for name, df in [("region", region), ("nation", nation),
                     ("supplier", supplier), ("customer", customer),
                     ("part", part), ("orders", orders),
                     ("lineitem", lineitem)]:
        df.to_parquet(f"{tmp}/{name}.parquet", index=False)
    return str(tmp)


@pytest.mark.parametrize("seed,empty_windows",
                         [(3, False), (4, False), (5, True)])
def test_tpch_fuzz_matches_duckdb(ray_session, tmp_path, seed,
                                  empty_windows):
    sf_dir = _write_corpus(tmp_path, np.random.default_rng(seed),
                           empty_windows=empty_windows)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name in ALL_TPCH:
        res = QUERIES[name](sf_dir)
        got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        want = con.execute(ORACLE[name]).df()
        assert len(got) == len(want), (name, seed, len(got), len(want))
        assert sorted(got.columns) == sorted(want.columns), (name, seed)
        assert _norm(got) == _norm(want), (name, seed)
    con.close()
