"""TPC-H Q2/Q9/Q11/Q16/Q20 over a synthesized ``partsupp``.

The driver's read-only testdata ships no partsupp table, so the five
partsupp queries were out of reach by construction (``tpch.py:1-4``).
This module closes the gap by DERIVING partsupp deterministically from
the tables that do exist, with pure integer arithmetic the DuckDB
oracle reproduces bit-for-bit in a CTE — making all five queries
hash-oracleable by the correctness driver, not merely pytest-pinned.

With ``cnt = |supplier|`` and ``step = cnt//4 + 1`` (keys are 0-based
in this testdata family):

    for i in 0..3:
        ps_suppkey      = (p_partkey + i*step) % cnt
        ps_availqty     = (p_partkey*7   + ps_suppkey*13) % 9999  + 1
        ps_supplycost_c = (p_partkey*131 + ps_suppkey*17) % 99901 + 100

``step`` is chosen so the four suppkeys are distinct for every
supplier count this corpus ships (``i*step % cnt != 0`` for i in 1..3
when cnt is 10/100/1000 — the TPC-H spec's own formula needs
S >= 10000 for that guarantee). ``ps_supplycost_c`` is integer CENTS
(1.00–1000.00), keeping every money aggregate exact under distributed
summation like the rest of the suite.

Scale shapes (same conventions as ``tpch.py``):

- partsupp is never materialized as a table: each part's four rows
  expand INSIDE the block that holds the part row, so per-part
  reductions (Q2 min-cost winner, Q11 per-part value) are block-local
  with ZERO shuffle, and lineitem-side queries (Q9, Q20) evaluate
  partsupp membership — ``(l_suppkey - l_partkey) % cnt in
  {i*step % cnt}`` — and the cost/qty columns as vectorized
  arithmetic instead of a join against a 4x-part-sized table.
- supplier/nation/region collapse to broadcast numpy LUTs (the same
  dimension-broadcast assumption Q5/Q7/Q8 document).
- Q9/Q16/Q20 spend exactly ONE all-to-all (okey- or group-hash bucket
  ``groupby(pb).map_groups``) and finish on the driver with
  dimension-bounded partials (nation x year / brand x type x size /
  suppkey — a few hundred rows per block at most).
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsonschema_ray.pipelines.tpch import (
    _driver_finish, _nbuckets, _pq, _read, _scale100)


def _dims(sf_dir: str):
    """Driver-side read of the dimension tables → LUT dict."""
    import pyarrow.parquet as pq

    sup = pq.read_table(_pq(sf_dir, "supplier"))
    nat = pq.read_table(_pq(sf_dir, "nation"))
    reg = pq.read_table(_pq(sf_dir, "region"))
    cnt = sup.num_rows
    sk = sup.column("s_suppkey").to_numpy()
    hi = int(sk.max()) + 1
    s_nation = np.zeros(hi, dtype=np.int64)
    s_nation[sk] = sup.column("s_nationkey").to_numpy()
    s_acct_c = np.zeros(hi, dtype=np.int64)
    s_acct_c[sk] = _scale100(sup.column("s_acctbal")).to_numpy()
    s_name = np.empty(hi, dtype=object)
    s_name[sk] = np.asarray(sup.column("s_name").to_pylist(), dtype=object)
    nk = nat.column("n_nationkey").to_numpy()
    nhi = int(nk.max()) + 1
    n_region = np.zeros(nhi, dtype=np.int64)
    n_region[nk] = nat.column("n_regionkey").to_numpy()
    n_name = np.empty(nhi, dtype=object)
    n_name[nk] = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    region_of = {r["r_name"]: r["r_regionkey"] for r in reg.to_pylist()}
    return {"cnt": cnt, "step": cnt // 4 + 1, "s_nation": s_nation,
            "s_acct_c": s_acct_c, "s_name": s_name, "n_region": n_region,
            "n_name": n_name, "region_of": region_of,
            "nation_of": {n_name[k]: int(k) for k in nk}}


def _ps_expand(pk: np.ndarray, cnt: int, step: int):
    """The partsupp rows of a partkey vector as (n,4) suppkey/avail/
    cost matrices — the whole synthesized table for these parts,
    block-local."""
    sk = (pk[:, None] + np.arange(4, dtype=np.int64) * step) % cnt
    avail = (pk[:, None] * 7 + sk * 13) % 9999 + 1
    cost = (pk[:, None] * 131 + sk * 17) % 99901 + 100
    return sk, avail, cost


#: shared oracle CTE — the SQL twin of ``_ps_expand`` (0-based keys)
_PS_CTE = """
WITH scnt AS (SELECT COUNT(*) AS cnt FROM supplier),
ps0 AS (
    SELECT p_partkey AS ps_partkey,
           (p_partkey + i.i * (cnt // 4 + 1)) % cnt AS ps_suppkey,
           p_name, p_brand, p_type, p_size
    FROM part, scnt, generate_series(0, 3) AS i(i)
),
ps AS (
    SELECT *,
           (ps_partkey * 7   + ps_suppkey * 13) % 9999  + 1 AS ps_availqty,
           (ps_partkey * 131 + ps_suppkey * 17) % 99901 + 100
               AS ps_supplycost_c
    FROM ps0
)
"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (adapted: p_size <= 15, p_type = 'LARGE';
# the trimmed part has no p_mfgr → p_brand stands in)
# ---------------------------------------------------------------------------

def q_q2_min_cost_supplier(sf_dir: str):
    """For each qualifying part, every EUROPE supplier achieving the
    minimum supply cost; global top-100 by account balance. Scale
    shape: the four partsupp rows of a part live in its block, so the
    min-cost winner is a block-local (n,4) argmin — zero shuffle; each
    block emits its local top-100 and the driver merges
    100-per-block partials."""
    d = _dims(sf_dir)
    cnt, step = d["cnt"], d["step"]
    eu = d["region_of"]["EUROPE"]
    sup_in_eu = d["n_region"][d["s_nation"]] == eu
    s_acct_c, s_name = d["s_acct_c"], d["s_name"]
    n_name_of_sup = d["n_name"][d["s_nation"]]

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_brand",
                                        "p_type", "p_size"],
               filter=(pc.field("p_size") <= 15)
               & (pc.field("p_type") == "LARGE"))

    schema = pa.schema([("s_acctbal_c", pa.int64()), ("s_name", pa.string()),
                        ("n_name", pa.string()), ("p_partkey", pa.int64()),
                        ("p_brand", pa.string()),
                        ("ps_supplycost_c", pa.int64())])

    def block(t: pa.Table) -> pa.Table:
        import pandas as pd

        keep = pc.and_(pc.less_equal(t.column("p_size"), 15),
                       pc.equal(t.column("p_type"), "LARGE"))
        t = t.filter(keep)
        if t.num_rows == 0:
            return schema.empty_table()
        pk = t.column("p_partkey").to_numpy()
        sk, _, cost = _ps_expand(pk, cnt, step)
        in_eu = sup_in_eu[sk]
        costm = np.where(in_eu, cost, np.iinfo(np.int64).max)
        mn = costm.min(axis=1)
        win = (costm == mn[:, None]) & in_eu
        pi, ii = np.nonzero(win)
        if len(pi) == 0:
            return schema.empty_table()
        wsk = sk[pi, ii]
        df = pd.DataFrame({
            "s_acctbal_c": s_acct_c[wsk],
            "s_name": s_name[wsk],
            "n_name": n_name_of_sup[wsk],
            "p_partkey": pk[pi],
            "p_brand": np.asarray(t.column("p_brand").to_pylist(),
                                  dtype=object)[pi],
            "ps_supplycost_c": cost[pi, ii],
        }).sort_values(["s_acctbal_c", "n_name", "s_name", "p_partkey"],
                       ascending=[False, True, True, True],
                       kind="stable").head(100)
        return pa.Table.from_pandas(df, schema=schema, preserve_index=False)

    parts = ds.map_batches(block, batch_format="pyarrow")
    import pandas as pd

    batches = list(parts.iter_batches(batch_format="pandas"))
    allp = pd.concat(batches, ignore_index=True) if batches else \
        schema.empty_table().to_pandas()
    out = allp.sort_values(["s_acctbal_c", "n_name", "s_name", "p_partkey"],
                           ascending=[False, True, True, True],
                           kind="stable").head(100)
    return pa.Table.from_pandas(out, schema=schema, preserve_index=False)


# ---------------------------------------------------------------------------
# Q11 — important stock identification (NATION_7 suppliers)
# ---------------------------------------------------------------------------

def q_q11_important_stock(sf_dir: str):
    """Per-part stock value (supplycost x availqty over NATION_7
    suppliers) exceeding 0.1% of the national total. Scale shape: the
    per-part value is block-local (the part's four rows never leave
    the block); the derived (part, value) dataset is materialized once
    — bounded by part cardinality, it streams/spills — then a
    tree-reduced global sum sets the threshold and a vectorized filter
    keeps the heavy parts. Threshold compare is integer
    (value*1000 > total), never float."""
    d = _dims(sf_dir)
    cnt, step = d["cnt"], d["step"]
    n7 = d["nation_of"]["NATION_7"]
    sup_in_n7 = d["s_nation"] == n7

    ds = _read(sf_dir, "part", columns=["p_partkey"])
    schema = pa.schema([("ps_partkey", pa.int64()), ("value_c", pa.int64())])

    def block(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy()
        if len(pk) == 0:
            return schema.empty_table()
        sk, avail, cost = _ps_expand(pk, cnt, step)
        val = np.where(sup_in_n7[sk], cost * avail, 0).sum(axis=1)
        m = val > 0
        return pa.table({"ps_partkey": pa.array(pk[m], pa.int64()),
                         "value_c": pa.array(val[m], pa.int64())})

    values = ds.map_batches(block, batch_format="pyarrow").materialize()
    total = int(values.sum("value_c") or 0)

    def heavy(t: pa.Table) -> pa.Table:
        m = pc.greater(pc.multiply(t.column("value_c"), pa.scalar(1000)),
                       pa.scalar(total))
        return t.filter(m)

    out = values.map_batches(heavy, batch_format="pyarrow")
    # typed driver finish: a zero-block dataset loses its schema in
    # to_pandas (fuzz lesson — see queries.py q1), so concatenate Arrow
    # batches against the declared schema instead
    batches = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    tab = pa.concat_tables(batches) if batches else schema.empty_table()
    return tab.to_pandas().sort_values(
        ["value_c", "ps_partkey"], ascending=[False, True],
        kind="stable").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (adapted: the "customer complaints"
# supplier exclusion becomes s_acctbal < 0 — no s_comment in the trim)
# ---------------------------------------------------------------------------

_Q16_SIZES = [3, 9, 14, 19, 23, 36, 45, 49]


def q_q16_parts_supplier_relationship(sf_dir: str):
    """Distinct-supplier count per (brand, type, size) for parts not of
    the excluded brand/type, skipping negative-balance suppliers.
    Scale shape: blocks emit block-distinct (brand, type, size,
    suppkey) rows pre-bucketed by group hash; ONE all-to-all; each
    bucket counts exact distincts vectorized (a group never spans
    buckets)."""
    from jsonschema_ray.functions.sketches import hash64

    d = _dims(sf_dir)
    cnt, step = d["cnt"], d["step"]
    bad_sup = d["s_acct_c"] < 0
    nb = _nbuckets()
    sizes = np.array(_Q16_SIZES, dtype=np.int32)

    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_brand", "p_type", "p_size"],
               filter=(pc.field("p_brand") != "Brand#5")
               & (pc.field("p_type") != "PROMO")
               & (pc.field("p_size").isin(_Q16_SIZES)))

    def pairs(t: pa.Table) -> pa.Table:
        import pandas as pd

        keep = pc.and_(
            pc.and_(pc.not_equal(t.column("p_brand"), "Brand#5"),
                    pc.not_equal(t.column("p_type"), "PROMO")),
            pc.is_in(t.column("p_size"), value_set=pa.array(sizes)))
        t = t.filter(keep)
        empty = pa.schema([("pb", pa.int32()), ("p_brand", pa.string()),
                           ("p_type", pa.string()), ("p_size", pa.int32()),
                           ("ps_suppkey", pa.int64())])
        if t.num_rows == 0:
            return empty.empty_table()
        pk = t.column("p_partkey").to_numpy()
        sk, _, _ = _ps_expand(pk, cnt, step)
        ok = ~bad_sup[sk]
        pi, ii = np.nonzero(ok)
        brand = np.asarray(t.column("p_brand").to_pylist(), dtype=object)[pi]
        ptype = np.asarray(t.column("p_type").to_pylist(), dtype=object)[pi]
        psize = t.column("p_size").to_numpy()[pi]
        df = pd.DataFrame({"p_brand": brand, "p_type": ptype,
                           "p_size": psize, "ps_suppkey": sk[pi, ii]})
        df = df.drop_duplicates()
        gkey = (df["p_brand"].astype(str) + "|" + df["p_type"].astype(str)
                + "|" + df["p_size"].astype(str)).to_numpy(dtype=object)
        df["pb"] = (hash64(gkey) % np.uint64(nb)).astype(np.int32)
        return pa.Table.from_pandas(df[["pb", "p_brand", "p_type",
                                        "p_size", "ps_suppkey"]],
                                    preserve_index=False)

    def count(g) -> "pa.Table":
        agg = g.groupby(["p_brand", "p_type", "p_size"], as_index=False)[
            "ps_suppkey"].nunique().rename(
                columns={"ps_suppkey": "supplier_cnt"})
        return pa.table({
            "p_brand": pa.array(agg["p_brand"], pa.string()),
            "p_type": pa.array(agg["p_type"], pa.string()),
            "p_size": pa.array(agg["p_size"], pa.int32()),
            "supplier_cnt": pa.array(agg["supplier_cnt"], pa.int64())})

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("pb").map_groups(count, batch_format="pandas")


# ---------------------------------------------------------------------------
# Q9 — product type profit (parts named '%red%', profit per nation/year)
# ---------------------------------------------------------------------------

def q_q9_product_type_profit(sf_dir: str):
    """Profit = revenue - supplycost x qty for red parts, grouped by
    supplier nation and order year. Scale shape: partsupp membership
    and supplycost are ARITHMETIC on (l_partkey, l_suppkey) — no
    partsupp join exists; the only all-to-all is the lineitem x orders
    okey-hash bucket merge (the Q21-proven single-barrier shape), each
    bucket emitting (nation, year) partials that the driver finishes —
    output bounded by 25 nations x 7 years."""
    import pyarrow.parquet as pq

    d = _dims(sf_dir)
    cnt, step = d["cnt"], d["step"]
    residues = np.unique((np.arange(4, dtype=np.int64) * step) % cnt)
    s_nation, n_name = d["s_nation"], d["n_name"]

    part = pq.read_table(_pq(sf_dir, "part"), columns=["p_partkey", "p_name"])
    pk = part.column("p_partkey").to_numpy()
    is_red = np.zeros(int(pk.max()) + 1, dtype=bool)
    red_mask = pc.match_substring(part.column("p_name"), "red") \
        .combine_chunks().to_numpy(zero_copy_only=False)
    is_red[pk[red_mask]] = True

    nb = _nbuckets()
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                        "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def tag_li(t: pa.Table) -> pa.Table:
        lpk = t.column("l_partkey").to_numpy()
        lsk = t.column("l_suppkey").to_numpy()
        m = is_red[lpk] & np.isin((lsk - lpk) % cnt, residues)
        t = t.filter(pa.array(m))
        lpk, lsk = lpk[m], lsk[m]
        okey = t.column("l_orderkey").to_numpy()
        rev = _scale100(pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(1.0, t.column("l_discount")))).to_numpy()
        cost = (lpk * 131 + lsk * 17) % 99901 + 100
        qty = t.column("l_quantity").to_numpy().astype(np.int64)
        profit = rev - cost * qty
        return pa.table({
            "pb": pa.array((okey % nb).astype(np.int32)),
            "side": pa.array(np.zeros(len(okey), dtype=np.int8)),
            "okey": pa.array(okey, pa.int64()),
            "nk": pa.array(s_nation[lsk], pa.int64()),
            "profit_c": pa.array(profit, pa.int64()),
            "o_year": pa.array(np.zeros(len(okey), dtype=np.int64)),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy()
        year = pc.year(t.column("o_orderdate")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(okey)
        return pa.table({
            "pb": pa.array((okey % nb).astype(np.int32)),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "okey": pa.array(okey, pa.int64()),
            "nk": pa.array(np.zeros(n, dtype=np.int64)),
            "profit_c": pa.array(np.zeros(n, dtype=np.int64)),
            "o_year": pa.array(year, pa.int64()),
        })

    unioned = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow"))

    def bucket(g) -> "pa.Table":
        l = g.loc[g["side"] == 0, ["okey", "nk", "profit_c"]]
        o = g.loc[g["side"] == 1, ["okey", "o_year"]]
        if l.empty or o.empty:
            return pa.table({"nk": pa.array([], pa.int64()),
                             "o_year": pa.array([], pa.int64()),
                             "profit_c": pa.array([], pa.int64())})
        m = l.merge(o, on="okey", how="inner")
        agg = m.groupby(["nk", "o_year"], as_index=False)["profit_c"].sum()
        return pa.table({"nk": pa.array(agg["nk"], pa.int64()),
                         "o_year": pa.array(agg["o_year"], pa.int64()),
                         "profit_c": pa.array(agg["profit_c"], pa.int64())})

    parts = unioned.groupby("pb").map_groups(bucket, batch_format="pandas")

    def build(agg):
        agg = agg.sort_values(["nk", "o_year"], ascending=[True, False],
                              kind="stable")
        return pa.table({
            "n_name": pa.array(n_name[agg["nk"].to_numpy().astype(np.int64)],
                               pa.string()),
            "o_year": pa.array(agg["o_year"], pa.int64()),
            "profit_c": pa.array(agg["profit_c"], pa.int64())})

    return _driver_finish(parts, ["nk", "o_year"], "profit_c", build)


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (EUROPE suppliers of 'small%' parts
# with surplus stock vs 1996-97 shipments; the single-nation filter of
# the official query is a region here — the trimmed corpus is too small
# for 1/25 nation selectivity to leave a meaningful result set)
# ---------------------------------------------------------------------------

def q_q20_potential_promotion(sf_dir: str):
    """Suppliers whose availqty exceeds half the 1996-97 shipped
    quantity of their small parts. Scale shape: lineitem is filtered
    at the read (shipdate pushdown) then by broadcast LUTs; per-block
    (partkey, suppkey, qty) partials pre-collapse before ONE group-hash
    bucket shuffle; availqty is arithmetic inside the bucket; the
    driver unions per-bucket distinct suppkeys (bounded by
    |supplier|)."""
    import pyarrow.parquet as pq

    d = _dims(sf_dir)
    cnt, step = d["cnt"], d["step"]
    residues = np.unique((np.arange(4, dtype=np.int64) * step) % cnt)
    eu = d["region_of"]["EUROPE"]
    sup_in_eu = d["n_region"][d["s_nation"]] == eu
    s_name = d["s_name"]

    part = pq.read_table(_pq(sf_dir, "part"), columns=["p_partkey", "p_name"])
    pk = part.column("p_partkey").to_numpy()
    is_small = np.zeros(int(pk.max()) + 1, dtype=bool)
    small_mask = pc.starts_with(part.column("p_name"), "small") \
        .combine_chunks().to_numpy(zero_copy_only=False)
    is_small[pk[small_mask]] = True

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    nb = _nbuckets()

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
               filter=(pc.field("l_shipdate") >= lo)
               & (pc.field("l_shipdate") < hi))

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        keep = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
            pc.less(t.column("l_shipdate"), pa.scalar(hi)))
        t = t.filter(keep)
        lpk = t.column("l_partkey").to_numpy()
        lsk = t.column("l_suppkey").to_numpy()
        m = (is_small[lpk] & sup_in_eu[lsk]
             & np.isin((lsk - lpk) % cnt, residues))
        lpk, lsk = lpk[m], lsk[m]
        qty_c = _scale100(t.column("l_quantity")).to_numpy()[m]
        df = pd.DataFrame({"pk": lpk, "sk": lsk, "qty_c": qty_c}) \
            .groupby(["pk", "sk"], as_index=False)["qty_c"].sum()
        return pa.table({
            "pb": pa.array(((df["pk"].to_numpy() * np.int64(1000003)
                             + df["sk"].to_numpy()) % nb).astype(np.int32)),
            "pk": pa.array(df["pk"], pa.int64()),
            "sk": pa.array(df["sk"], pa.int64()),
            "qty_c": pa.array(df["qty_c"], pa.int64())})

    def bucket(g) -> "pa.Table":
        agg = g.groupby(["pk", "sk"], as_index=False)["qty_c"].sum()
        pkv = agg["pk"].to_numpy().astype(np.int64)
        skv = agg["sk"].to_numpy().astype(np.int64)
        avail = (pkv * 7 + skv * 13) % 9999 + 1
        keep = avail * 200 > agg["qty_c"].to_numpy()
        return pa.table({"s_suppkey": pa.array(np.unique(skv[keep]),
                                               pa.int64())})

    parts = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("pb").map_groups(bucket, batch_format="pandas")
    import pandas as pd

    batches = list(parts.iter_batches(batch_format="pandas"))
    sks = np.unique(np.concatenate(
        [b["s_suppkey"].to_numpy() for b in batches])) if batches else \
        np.array([], dtype=np.int64)
    names = s_name[sks] if len(sks) else np.array([], dtype=object)
    order = np.argsort(names, kind="stable")
    return pa.table({"s_suppkey": pa.array(sks[order], pa.int64()),
                     "s_name": pa.array(names[order], pa.string())})


# ---------------------------------------------------------------------------
# Oracle SQL (shares the _PS_CTE twin of the generator)
# ---------------------------------------------------------------------------

PARTSUPP_ORACLE: dict[str, str] = {
    "q2_min_cost_supplier": _PS_CTE + """
, eu AS (
    SELECT ps.ps_partkey, ps.p_brand, ps.ps_supplycost_c,
           s_name, CAST(FLOOR(s_acctbal*100 + 0.5) AS BIGINT) AS s_acctbal_c,
           n_name
    FROM ps
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_size <= 15 AND p_type = 'LARGE'
)
SELECT s_acctbal_c, s_name, n_name, ps_partkey AS p_partkey, p_brand,
       ps_supplycost_c
FROM eu
WHERE ps_supplycost_c = (SELECT MIN(e2.ps_supplycost_c) FROM eu e2
                         WHERE e2.ps_partkey = eu.ps_partkey)
ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    "q9_product_type_profit": _PS_CTE + """
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(
           CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)
           - ps_supplycost_c * CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS profit_c
FROM lineitem
JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
""",
    "q11_important_stock": _PS_CTE + """
, nps AS (
    SELECT ps_partkey, ps_supplycost_c * ps_availqty AS v
    FROM ps JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
)
SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_c
FROM nps
GROUP BY ps_partkey
HAVING SUM(v) * 1000 > (SELECT SUM(v) FROM nps)
ORDER BY value_c DESC, ps_partkey
""",
    "q16_parts_supplier_relationship": _PS_CTE + """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    "q20_potential_promotion": _PS_CTE + """
, shipped AS (
    SELECT l_partkey, l_suppkey,
           SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS qty_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_partkey, l_suppkey
)
SELECT DISTINCT s_suppkey, s_name
FROM shipped
JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_name LIKE 'small%' AND r_name = 'EUROPE'
  AND ps_availqty * 200 > qty_c
ORDER BY s_name
""",
}

PARTSUPP_QUERIES = {
    "q2_min_cost_supplier": q_q2_min_cost_supplier,
    "q9_product_type_profit": q_q9_product_type_profit,
    "q11_important_stock": q_q11_important_stock,
    "q16_parts_supplier_relationship": q_q16_parts_supplier_relationship,
    "q20_potential_promotion": q_q20_potential_promotion,
}
