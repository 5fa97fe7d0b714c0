"""TPC-H-style relational breadth queries (the 12 of the remaining 17
official queries expressible over the driver's trimmed TPC-H-ish
tables — no ``partsupp`` table exists, so Q2/Q9/Q11/Q16/Q20 are out of
reach by construction).

Column trims force documented adaptations that PRESERVE each query's
relational shape (the part the engine is being exercised on):

- lineitem has no ``l_commitdate``/``l_receiptdate``/``l_shipmode`` →
  Q4/Q12/Q21's "late delivery" predicate becomes ``l_returnflag='R'``
  and Q12 groups by ``l_linestatus``;
- customer has no ``c_phone`` → Q22's country-code prefix becomes a
  nation-key set, and (every sf customer has ≥1 order) the anti-join
  is "no order since 2000-01-01" (dormant customers);
- orders has no ``o_comment`` → Q13 excludes ``o_orderstatus='P'``;
- part has no ``p_container`` → Q17/Q19 filter on ``p_size`` ranges.

Money/quantity aggregates use the repo-wide exact scaled-integer-cents
protocol (``floor(x*100+0.5)`` per row, int64 sums) so distributed
summation matches the sequential DuckDB oracle bit-for-bit; ratio
outputs (Q8, Q14) emit numerator+denominator ints instead of a
float division.

Scale shapes follow the committed conventions (see queries.py Q1/Q3/
Q5/Q10/Q18): predicate+projection pushdown at the read, per-block
Arrow combiners so shuffles carry group cardinality, dimension tables
as broadcast numpy LUTs, distributed hash joins only where both sides
are genuinely large, driver materialization only for O(1) scalars.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def _read(sf_dir: str, table: str, columns=None, **kw):
    from jsonschema_ray.raycompat import read_parquet_clean

    return read_parquet_clean(_pq(sf_dir, table), columns=columns, **kw)


def _scale100(arr) -> pa.Array:
    """floor(x*100 + 0.5) as int64 (see queries._scale100)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))


def _revenue_c(t: pa.Table) -> pa.Array:
    return _scale100(pc.multiply(t.column("l_extendedprice"),
                                 pc.subtract(1.0, t.column("l_discount"))))


def _nparts() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(2, min(32, cpus // 2))


def _nbuckets() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(2, min(64, cpus * 2))


def _driver_finish(parts, key, val, build):
    """Merge tiny per-bucket (key(s), val(s)) partials on the driver:
    sum the val column(s) per key(s) and hand the sorted frame to
    ``build``. Used where the result is DIMENSION-bounded (≤ a few
    thousand rows) — a distributed aggregate here would add an
    all-to-all barrier with ~5-10 s of fixed cost (measured on Q21)
    to merge a handful of rows."""
    import pandas as pd

    keys = [key] if isinstance(key, str) else list(key)
    vals = [val] if isinstance(val, str) else list(val)
    batches = list(parts.iter_batches(batch_format="pandas"))
    if not batches:
        return build(pd.DataFrame({c: [] for c in keys + vals}))
    allp = pd.concat(batches, ignore_index=True)
    agg = allp.groupby(keys, as_index=False)[vals].sum() \
        .sort_values(keys, kind="stable").reset_index(drop=True)
    return build(agg)


def _scalar_row(ds, cols: list[str]) -> pa.Table:
    """Global integer sums of ``cols`` as a 1-row table. The aggregate
    tree-reduces partials; only O(len(cols)) ints reach the driver."""
    from ray.data.aggregate import Sum

    agg = ds.aggregate(*[Sum(c, alias_name=c) for c in cols])
    return pa.table({c: pa.array([int(agg[c] or 0)], pa.int64())
                     for c in cols})


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + filter + global sum
# ---------------------------------------------------------------------------

def q_q6_forecast_revenue(sf_dir: str):
    """TPC-H-Q6: revenue that would be gained by eliminating discounts
    in a band — a pure scan query. Scale shape: row-group pruning on
    l_shipdate at the read, vectorized mask, ONE partial row per block
    into a tree-reduced global sum; nothing shuffles."""
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)

    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"],
               filter=(pc.field("l_shipdate") >= lo)
               & (pc.field("l_shipdate") < hi))

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(t.column("l_shipdate"), pa.scalar(hi))),
            pc.and_(
                pc.and_(pc.greater_equal(t.column("l_discount"), 0.05),
                        pc.less_equal(t.column("l_discount"), 0.07)),
                pc.less(t.column("l_quantity"), 24.0)))
        t = t.filter(keep)
        rev = _scale100(pc.multiply(t.column("l_extendedprice"),
                                    t.column("l_discount")))
        return pa.table({
            "revenue_c": pa.array([int(pc.sum(rev).as_py() or 0)], pa.int64()),
            "n_items": pa.array([t.num_rows], pa.int64())})

    return _scalar_row(ds.map_batches(partial, batch_format="pyarrow"),
                       ["revenue_c", "n_items"])


# ---------------------------------------------------------------------------
# Q14 — promotion effect: fact ⋈ small-dimension via broadcast LUT
# ---------------------------------------------------------------------------

def q_q14_promo_revenue(sf_dir: str):
    """TPC-H-Q14: share of one month's revenue from PROMO parts.
    Scale shape: the part dimension collapses to a 1-byte-per-part
    bitmask LUT closed over by the batch kernel (broadcast once per
    worker, no shuffle); at extreme part cardinality this LUT becomes
    the Q17-style distributed join instead. Ratio emitted as exact
    (promo_c, total_c) integer cents, not a float division."""
    import pyarrow.parquet as pq

    part = pq.read_table(_pq(sf_dir, "part"), columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy()
    is_promo = np.zeros(int(pk.max()) + 1, dtype=bool)
    is_promo[pk[pc.equal(part.column("p_type"), "PROMO").combine_chunks()
                .to_numpy(zero_copy_only=False)]] = True

    lo = datetime.datetime(1996, 9, 1)
    hi = datetime.datetime(1996, 10, 1)

    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_partkey", "l_extendedprice",
                        "l_discount"],
               filter=(pc.field("l_shipdate") >= lo)
               & (pc.field("l_shipdate") < hi))

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
            pc.less(t.column("l_shipdate"), pa.scalar(hi)))
        t = t.filter(keep)
        rev = _revenue_c(t).to_numpy()
        promo = is_promo[t.column("l_partkey").to_numpy()]
        return pa.table({
            "promo_c": pa.array([int(rev[promo].sum())], pa.int64()),
            "total_c": pa.array([int(rev.sum())], pa.int64())})

    return _scalar_row(ds.map_batches(partial, batch_format="pyarrow"),
                       ["promo_c", "total_c"])


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunctive multi-attribute join predicate
# ---------------------------------------------------------------------------

_Q19_CLAUSES = [  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 5, 1.0, 11.0),
    ("Brand#23", 1, 10, 10.0, 20.0),
    ("Brand#24", 1, 15, 20.0, 30.0),
]


def q_q19_disjunctive_revenue(sf_dir: str):
    """TPC-H-Q19: revenue from an OR-of-ANDs of (brand, size, quantity)
    clauses — the classic disjunctive join-predicate query that defeats
    naive pushdown. Scale shape: part's (brand_id, size) become two
    int8/int32 LUT arrays; the whole disjunction evaluates as one
    vectorized numpy mask per block; one partial row per block."""
    import pyarrow.parquet as pq

    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy()
    brands = sorted({c[0] for c in _Q19_CLAUSES})
    bid = {b: i for i, b in enumerate(brands)}
    brand_lut = np.full(int(pk.max()) + 1, -1, dtype=np.int8)
    bcol = part.column("p_brand").to_pylist()
    brand_lut[pk] = np.array([bid.get(b, -1) for b in bcol], dtype=np.int8)
    size_lut = np.zeros(int(pk.max()) + 1, dtype=np.int32)
    size_lut[pk] = part.column("p_size").to_numpy()

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        key = t.column("l_partkey").to_numpy()
        qty = t.column("l_quantity").to_numpy()
        b = brand_lut[key]
        s = size_lut[key]
        mask = np.zeros(len(key), dtype=bool)
        for brand, slo, shi, qlo, qhi in _Q19_CLAUSES:
            mask |= ((b == bid[brand]) & (s >= slo) & (s <= shi)
                     & (qty >= qlo) & (qty <= qhi))
        rev = _revenue_c(t).to_numpy()[mask]
        return pa.table({
            "revenue_c": pa.array([int(rev.sum())], pa.int64()),
            "n_items": pa.array([int(mask.sum())], pa.int64())})

    return _scalar_row(ds.map_batches(partial, batch_format="pyarrow"),
                       ["revenue_c", "n_items"])


# ---------------------------------------------------------------------------
# Q4 — order-priority checking: EXISTS semi-join
# ---------------------------------------------------------------------------

def q_q4_order_priority(sf_dir: str):
    """TPC-H-Q4 (adapted: the "late delivery" EXISTS predicate is
    ``l_returnflag='R'`` — no commit/receipt dates in the trimmed
    schema): orders in a quarter with at least one flagged lineitem,
    counted per priority. Scale shape: ONE all-to-all — block-distinct
    flagged orderkeys and date-filtered (orderkey, priority-id) rows
    tag-union into okey-hash buckets; the EXISTS semi-join is a
    vectorized isin per bucket; the 5-value result merges on the
    driver from ≤5-row bucket partials (a join + two groupby barriers
    each cost ~5-10 s fixed at this block count — measured on Q21)."""
    import pandas as pd

    lo = datetime.datetime(1996, 7, 1)
    hi = datetime.datetime(1996, 10, 1)
    nb = _nbuckets()
    PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

    def li_distinct(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        col = t.column("l_orderkey")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = pc.unique(col).to_numpy()
        return pa.table({"okey": pa.array(u),
                         "prio": pa.array(np.full(len(u), -1, np.int64)),
                         "pb": pa.array((u % nb).astype(np.int64))})

    def ord_project(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
            pc.less(t.column("o_orderdate"), pa.scalar(hi)))
        t = t.filter(keep)
        ok = t.column("o_orderkey").to_numpy()
        pr = t.column("o_orderpriority")
        if isinstance(pr, pa.ChunkedArray):
            pr = pr.combine_chunks()
        prio = pc.index_in(pr, value_set=pa.array(PRIO)) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"okey": pa.array(ok), "prio": pa.array(prio),
                         "pb": pa.array((ok % nb).astype(np.int64))})

    flagged = _read(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_returnflag"]) \
        .map_batches(li_distinct, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(ord_project, batch_format="pyarrow")

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        fk = g.loc[g["prio"] < 0, "okey"].to_numpy()
        o = g.loc[g["prio"] >= 0]
        o = o[o["okey"].isin(fk)]
        out = o.groupby("prio", as_index=False).agg(n=("okey", "size"))
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = flagged.union(orders).groupby("pb") \
        .map_groups(bucket_merge, batch_format="pandas")
    return _driver_finish(
        parts, "prio", "n",
        lambda agg: pa.table({
            "o_orderpriority": pa.array(
                [PRIO[i] for i in agg["prio"]], pa.string()),
            "order_count": pa.array(
                agg["n"].to_numpy().astype(np.int64))}))


# ---------------------------------------------------------------------------
# Q12 — shipping-priority split: join + conditional aggregation
# ---------------------------------------------------------------------------

def q_q12_linestatus_priority(sf_dir: str):
    """TPC-H-Q12 (adapted: groups by ``l_linestatus`` — the trimmed
    schema has no shipmode — with the ship-window filter on
    l_shipdate): per-group counts of high- vs low-priority orders.
    Scale shape: ONE all-to-all — both sides project to (okey,
    payload-int) and tag-union into okey-hash buckets (priority and
    linestatus pre-lowered to ints so no string ever shuffles); the
    join + conditional aggregation run vectorized per bucket; the
    2-row result merges on the driver (each extra join/groupby
    barrier costs ~5-10 s fixed at this block count — measured on
    Q21)."""
    import pandas as pd

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    nb = _nbuckets()

    def ord_project(t: pa.Table) -> pa.Table:
        pr = t.column("o_orderpriority")
        if isinstance(pr, pa.ChunkedArray):
            pr = pr.combine_chunks()
        is_high = pc.or_(pc.equal(pr, "1-URGENT"), pc.equal(pr, "2-HIGH"))
        ok = t.column("o_orderkey").to_numpy()
        return pa.table({"okey": pa.array(ok),
                         "v": is_high.cast(pa.int64()),
                         "side": pa.array(np.zeros(len(ok), np.int64)),
                         "pb": pa.array((ok % nb).astype(np.int64))})

    def li_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
            pc.less(t.column("l_shipdate"), pa.scalar(hi))))
        ok = t.column("l_orderkey").to_numpy()
        st = pc.equal(t.column("l_linestatus"), "O").cast(pa.int64())
        return pa.table({"okey": pa.array(ok), "v": st,
                         "side": pa.array(np.ones(len(ok), np.int64)),
                         "pb": pa.array((ok % nb).astype(np.int64))})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(ord_project, batch_format="pyarrow")
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_linestatus", "l_shipdate"],
                     filter=(pc.field("l_shipdate") >= lo)
                     & (pc.field("l_shipdate") < hi)) \
        .map_batches(li_project, batch_format="pyarrow")

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == 0, ["okey", "v"]] \
            .rename(columns={"v": "is_high"})
        li = g.loc[g["side"] == 1, ["okey", "v"]] \
            .rename(columns={"v": "is_o"})
        j = li.merge(o, on="okey", how="inner")
        j["low"] = 1 - j["is_high"]
        out = j.groupby("is_o", as_index=False).agg(
            h=("is_high", "sum"), l=("low", "sum"))
        return out.astype(np.int64)

    parts = lineitem.union(orders).groupby("pb") \
        .map_groups(bucket_merge, batch_format="pandas")

    def build(agg):
        status = np.where(agg["is_o"].to_numpy() == 1, "O", "F")
        return pa.table({
            "l_linestatus": pa.array(status.astype(object), pa.string()),
            "high_line_count": pa.array(agg["h"].to_numpy()
                                        .astype(np.int64)),
            "low_line_count": pa.array(agg["l"].to_numpy()
                                       .astype(np.int64))})

    return _driver_finish(parts, "is_o", ["h", "l"], build)


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: left outer join, two-level
# ---------------------------------------------------------------------------

def q_q13_customer_distribution(sf_dir: str):
    """TPC-H-Q13 (adapted: excluded orders are ``o_orderstatus='P'`` —
    no o_comment in the trimmed schema): histogram of per-customer
    order counts INCLUDING zero-order customers. Scale shape: ONE
    all-to-all — customers emit (custkey, 0) and order blocks
    pre-counted (custkey, n) partials into custkey-hash buckets; each
    bucket sums per customer AND value-counts the c_count histogram,
    so the driver merges ≤|distinct counts| rows per bucket. The
    skew-prone per-order join never happens and no second groupby
    barrier is paid."""
    import pandas as pd

    nb = _nbuckets()

    def cust_thin(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy().astype(np.int64)
        return pa.table({"ckey": pa.array(ck),
                         "n": pa.array(np.zeros(len(ck), np.int64)),
                         "pb": pa.array((ck % nb).astype(np.int64))})

    def ord_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("o_orderstatus"), "P")))
        col = t.column("o_custkey")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = col.value_counts()
        ck = vc.field("values").to_numpy().astype(np.int64)
        return pa.table({"ckey": pa.array(ck),
                         "n": vc.field("counts").cast(pa.int64()),
                         "pb": pa.array((ck % nb).astype(np.int64))})

    cust = _read(sf_dir, "customer", columns=["c_custkey"]) \
        .map_batches(cust_thin, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]) \
        .map_batches(ord_partial, batch_format="pyarrow")

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g.groupby("ckey", as_index=False)["n"].sum()
        hist = per_cust.groupby("n", as_index=False).agg(d=("ckey", "size"))
        return hist.rename(columns={"n": "c_count"}).astype(np.int64)

    parts = cust.union(orders).groupby("pb") \
        .map_groups(bucket_merge, batch_format="pandas")
    return _driver_finish(
        parts, "c_count", "d",
        lambda agg: pa.table({
            "c_count": pa.array(agg["c_count"].to_numpy().astype(np.int64)),
            "custdist": pa.array(agg["d"].to_numpy().astype(np.int64))}))


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year
# ---------------------------------------------------------------------------

_Q7_A, _Q7_B = 3, 7  # nationkeys (NATION_3 / NATION_7)


def q_q7_volume_shipping(sf_dir: str):
    """TPC-H-Q7: bilateral trade volume between two nations by ship
    year. Scale shape: supplier and customer nationkeys become
    broadcast LUTs applied AT THE SCAN so both join inputs are
    pre-filtered to the two nations (~8% of rows) and carry only
    (key, nat-int8, year-int16, cents); one distributed hash join;
    the 4-group combiner groupby is free."""
    import pyarrow.parquet as pq

    def lut(table: str, key: str, val: str) -> np.ndarray:
        t = pq.read_table(_pq(sf_dir, table), columns=[key, val])
        k = t.column(key).to_numpy()
        out = np.full(int(k.max()) + 1, -1, dtype=np.int64)
        out[k] = t.column(val).to_numpy()
        return out

    supp_nat = lut("supplier", "s_suppkey", "s_nationkey")
    cust_nat = lut("customer", "c_custkey", "c_nationkey")

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1998, 1, 1)

    def li_map(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate")
        keep = pc.and_(pc.greater_equal(ship, pa.scalar(lo)),
                       pc.less(ship, pa.scalar(hi)))
        t = t.filter(keep)
        s_nat = supp_nat[t.column("l_suppkey").to_numpy()]
        m = (s_nat == _Q7_A) | (s_nat == _Q7_B)
        t = t.filter(pa.array(m))
        year = pc.year(t.column("l_shipdate")).cast(pa.int64())
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "s_nat": pa.array(s_nat[m]),
            "l_year": year,
            "volume_c": _revenue_c(t)})

    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_suppkey", "l_shipdate",
                              "l_extendedprice", "l_discount"],
                     filter=(pc.field("l_shipdate") >= lo)
                     & (pc.field("l_shipdate") < hi)) \
        .map_batches(li_map, batch_format="pyarrow")

    def ord_map(t: pa.Table) -> pa.Table:
        c_nat = cust_nat[t.column("o_custkey").to_numpy()]
        m = (c_nat == _Q7_A) | (c_nat == _Q7_B)
        t = t.filter(pa.array(m))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "c_nat": pa.array(c_nat[m])})

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]) \
        .map_batches(ord_map, batch_format="pyarrow")

    # ONE all-to-all: both thin sides tag-union into okey-hash buckets;
    # the join + pair filter + (nation-pair, year) aggregation run
    # vectorized per bucket; the ≤8-row result merges on the driver.
    # nb is resolved ONCE here on the driver — a per-batch
    # cluster_resources() call inside the UDF could see different CPU
    # counts mid-query and bucket the two sides with different moduli,
    # silently dropping join matches.
    nb = _nbuckets()

    def bucketize(side):
        def fn(t: pa.Table) -> pa.Table:
            ok = t.column(t.column_names[0]).to_numpy()
            t = t.append_column("pb", pa.array((ok % nb).astype(np.int64)))
            return t.append_column(
                "side", pa.array(np.full(len(ok), side, np.int64)))
        return fn

    li_b = lineitem.map_batches(bucketize(0), batch_format="pyarrow")
    or_b = orders.map_batches(bucketize(1), batch_format="pyarrow") \
        .map_batches(
            lambda t: pa.table({
                "l_orderkey": t.column("o_orderkey"),
                "s_nat": t.column("c_nat").cast(pa.int64()),
                "l_year": pa.nulls(t.num_rows, pa.int64()),
                "volume_c": pa.nulls(t.num_rows, pa.int64()),
                "pb": t.column("pb"), "side": t.column("side")}),
            batch_format="pyarrow")

    import pandas as pd

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        li = g.loc[g["side"] == 0, ["l_orderkey", "s_nat", "l_year",
                                    "volume_c"]].copy()
        # re-narrow the null-padded columns to int64 BEFORE summing:
        # Arrow int64-with-nulls arrives in pandas as float64, and a
        # float64 cents sum goes inexact past 2^53 (values are exact,
        # the accumulation is not) — the exact-integer protocol
        # requires the groupby sums to run in int64
        for c in ("s_nat", "l_year", "volume_c"):
            li[c] = li[c].astype(np.int64)
        o = g.loc[g["side"] == 1, ["l_orderkey", "s_nat"]] \
            .rename(columns={"s_nat": "c_nat"})
        j = li.merge(o, on="l_orderkey", how="inner")
        j = j[j["s_nat"] != j["c_nat"]]
        # pack (s_nat, c_nat, year) into one int key for the driver sum
        j["k"] = (j["s_nat"] * 1_000_000 + j["c_nat"].astype(np.int64)
                  * 10_000 + j["l_year"])
        out = j.groupby("k", as_index=False)["volume_c"].sum()
        return out.astype(np.int64)

    parts = li_b.union(or_b).groupby("pb") \
        .map_groups(bucket_merge, batch_format="pandas")

    def build(agg):
        k = agg["k"].to_numpy()
        return pa.table({
            "supp_nation": pa.array(
                [f"NATION_{v}" for v in k // 1_000_000], pa.string()),
            "cust_nation": pa.array(
                [f"NATION_{v}" for v in k % 1_000_000 // 10_000],
                pa.string()),
            "l_year": pa.array((k % 10_000).astype(np.int64)),
            "volume_c": pa.array(
                agg["volume_c"].to_numpy().astype(np.int64))})

    return _driver_finish(parts, "k", "volume_c", build)


# ---------------------------------------------------------------------------
# Q8 — national market share within a region, by year
# ---------------------------------------------------------------------------

def q_q8_market_share(sf_dir: str):
    """TPC-H-Q8 (share emitted as exact (nation_c, total_c) integer
    cents per year instead of a float division): NATION_8's share of
    EUROPE-customer PROMO-part volume. Scale shape: three dimension
    LUTs (part→is_promo bitmask, supplier→nationkey,
    customer→in-region bitmask via the 25-row nation table); lineitem
    pre-filters to PROMO parts at the scan (~1/6 survive); one
    distributed hash join with orders pre-filtered to region+window;
    per-block combiner groupby on the 2-value year."""
    import pyarrow.parquet as pq

    part = pq.read_table(_pq(sf_dir, "part"), columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy()
    is_promo = np.zeros(int(pk.max()) + 1, dtype=bool)
    is_promo[pk[pc.equal(part.column("p_type"), "PROMO").combine_chunks()
                .to_numpy(zero_copy_only=False)]] = True

    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy()
    supp_nat = np.full(int(sk.max()) + 1, -1, dtype=np.int64)
    supp_nat[sk] = supp.column("s_nationkey").to_numpy()

    nation = pq.read_table(_pq(sf_dir, "nation"),
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(_pq(sf_dir, "region"))
    eu = region.filter(pc.equal(region.column("r_name"), "EUROPE")) \
        .column("r_regionkey")[0].as_py()
    eu_nations = set(
        nation.filter(pc.equal(nation.column("n_regionkey"), eu))
        .column("n_nationkey").to_pylist())
    cust = pq.read_table(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy()
    cn = cust.column("c_nationkey").to_numpy()
    cust_in_eu = np.zeros(int(ck.max()) + 1, dtype=bool)
    cust_in_eu[ck] = np.isin(cn, list(eu_nations))

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1998, 1, 1)

    def li_map(t: pa.Table) -> pa.Table:
        m = is_promo[t.column("l_partkey").to_numpy()]
        t = t.filter(pa.array(m))
        s_nat = supp_nat[t.column("l_suppkey").to_numpy()]
        rev = _revenue_c(t)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "nation_c": pc.multiply(
                rev, pa.array((s_nat == 8).astype(np.int64))),
            "total_c": rev})

    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_partkey", "l_suppkey",
                              "l_extendedprice", "l_discount"]) \
        .map_batches(li_map, batch_format="pyarrow")

    def ord_map(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate")
        keep = pc.and_(pc.greater_equal(od, pa.scalar(lo)),
                       pc.less(od, pa.scalar(hi)))
        t = t.filter(keep)
        m = cust_in_eu[t.column("o_custkey").to_numpy()]
        t = t.filter(pa.array(m))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_year": pc.year(t.column("o_orderdate"))
                         .cast(pa.int64())})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=(pc.field("o_orderdate") >= lo)
                   & (pc.field("o_orderdate") < hi)) \
        .map_batches(ord_map, batch_format="pyarrow")

    # ONE all-to-all: both thin sides tag-union into okey-hash buckets;
    # join + per-year share sums run vectorized per bucket; the 2-row
    # result merges on the driver
    import pandas as pd

    nb = _nbuckets()

    def tag_li(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy()
        return t.append_column("pb", pa.array((ok % nb).astype(np.int64))) \
            .append_column("o_year",
                           pa.nulls(t.num_rows, pa.int64())) \
            .append_column("side", pa.array(np.zeros(t.num_rows, np.int64)))

    def tag_or(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy()
        n = t.num_rows
        return pa.table({
            "l_orderkey": t.column("o_orderkey"),
            "nation_c": pa.nulls(n, pa.int64()),
            "total_c": pa.nulls(n, pa.int64()),
            "pb": pa.array((ok % nb).astype(np.int64)),
            "o_year": t.column("o_year"),
            "side": pa.array(np.ones(n, np.int64))})

    li_b = lineitem.map_batches(tag_li, batch_format="pyarrow")
    or_b = orders.map_batches(tag_or, batch_format="pyarrow")

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        li = g.loc[g["side"] == 0,
                   ["l_orderkey", "nation_c", "total_c"]].copy()
        o = g.loc[g["side"] == 1, ["l_orderkey", "o_year"]].copy()
        # re-narrow null-padded columns to int64 BEFORE summing (the
        # union's nulls widened them to float64 in pandas; a float64
        # cents accumulation goes inexact past 2^53)
        li[["nation_c", "total_c"]] = \
            li[["nation_c", "total_c"]].astype(np.int64)
        o["o_year"] = o["o_year"].astype(np.int64)
        j = li.merge(o, on="l_orderkey", how="inner")
        out = j.groupby("o_year", as_index=False)[
            ["nation_c", "total_c"]].sum()
        return out.astype(np.int64)

    parts = li_b.union(or_b).groupby("pb") \
        .map_groups(bucket_merge, batch_format="pandas")
    return _driver_finish(
        parts, "o_year", ["nation_c", "total_c"],
        lambda agg: pa.table({
            "o_year": pa.array(agg["o_year"].to_numpy().astype(np.int64)),
            "nation_c": pa.array(agg["nation_c"].to_numpy()
                                 .astype(np.int64)),
            "total_c": pa.array(agg["total_c"].to_numpy()
                                .astype(np.int64))}))


# ---------------------------------------------------------------------------
# Q15 — top supplier: aggregate → global max → equality filter
# ---------------------------------------------------------------------------

def q_q15_top_supplier(sf_dir: str):
    """TPC-H-Q15: the supplier(s) with maximum revenue in a quarter
    (the view + scalar-subquery shape). Scale shape: per-block
    combiner (suppkey, cents) → thin groupby-sum (|suppliers| rows);
    the scalar subquery is a tree-reduced global Max (O(1) to the
    driver); name attribution is a broadcast LUT over the supplier
    dimension."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_name"])
    sk = supp.column("s_suppkey").to_numpy()
    sname = np.empty(int(sk.max()) + 1, dtype=object)
    sname[sk] = supp.column("s_name").to_numpy(zero_copy_only=False)

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 4, 1)

    def partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate")
        keep = pc.and_(pc.greater_equal(ship, pa.scalar(lo)),
                       pc.less(ship, pa.scalar(hi)))
        t = t.filter(keep)
        base = pa.table({"l_suppkey": t.column("l_suppkey"),
                         "cents": _revenue_c(t)})
        return base.group_by("l_suppkey").aggregate([("cents", "sum")]) \
            .rename_columns(["l_suppkey", "cents"])

    rev = _read(sf_dir, "lineitem",
                columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                         "l_discount"],
                filter=(pc.field("l_shipdate") >= lo)
                & (pc.field("l_shipdate") < hi)) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("l_suppkey") \
        .aggregate(Sum("cents", alias_name="total_revenue_c"))

    # materialize the |suppliers|-row aggregate ONCE: .max() would
    # otherwise execute the pipeline and the winners filter would
    # re-execute it from scratch (two full passes for one barrier's
    # worth of work)
    rev = rev.materialize()
    best_raw = rev.max("total_revenue_c") if rev.count() else None
    if best_raw is None:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue_c": pa.array([], pa.int64())})
    best = int(best_raw)

    def winners(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("total_revenue_c"), best))
        keys = t.column("l_suppkey").to_numpy()
        return pa.table({
            "s_suppkey": pa.array(keys, pa.int64()),
            "s_name": pa.array(sname[keys], pa.string()),
            "total_revenue_c": t.column("total_revenue_c")})

    return rev.map_batches(winners, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated per-part average
# ---------------------------------------------------------------------------

def q_q17_small_quantity(sf_dir: str):
    """TPC-H-Q17 (adapted: the part filter is brand + p_size ≤ 10 —
    no p_container in the trimmed schema): revenue from lineitems
    whose quantity is below 20% of their part's average. Scale shape:
    the correlated AVG subquery becomes (pass 1) a combinered
    per-part (sum_qty_c, n) aggregate over the brand-restricted
    lineitem stream, then (pass 2) a distributed hash join of the
    same thin stream against those averages — NOT a broadcast, so
    the shape survives a part table of any size; the threshold
    compare is the exact integer cross-multiplication
    5·qty_c·n < sum_qty_c (no float division anywhere)."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    part = pq.read_table(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_size"])
    sel = part.filter(pc.and_(pc.equal(part.column("p_brand"), "Brand#23"),
                              pc.less_equal(part.column("p_size"), 10))) \
        .column("p_partkey").combine_chunks()

    def li_thin(t: pa.Table) -> pa.Table:
        col = t.column("l_partkey")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = t.filter(pc.is_in(col, value_set=sel))
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "qty_c": _scale100(t.column("l_quantity")),
                         "price_c": _scale100(t.column("l_extendedprice"))})

    def read_thin():
        return _read(sf_dir, "lineitem",
                     columns=["l_partkey", "l_quantity",
                              "l_extendedprice"]) \
            .map_batches(li_thin, batch_format="pyarrow")

    def avg_partial(t: pa.Table) -> pa.Table:
        base = t.append_column("one", pa.array(np.ones(t.num_rows, np.int64)))
        return base.select(["l_partkey", "qty_c", "one"]) \
            .group_by("l_partkey") \
            .aggregate([("qty_c", "sum"), ("one", "sum")]) \
            .rename_columns(["l_partkey", "sq", "n"])

    avgs = read_thin().map_batches(avg_partial, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("sq", alias_name="sum_qty_c"),
                                        Sum("n", alias_name="n")) \
        .rename_columns({"l_partkey": "p_key"})

    # hash_join, not Dataset.join: the brand filter makes the join
    # keys SPARSE (a handful of partkeys at small SF), which trips
    # Ray's native join empty-partition finalize crash — see
    # joins.hash_join's docstring.
    from jsonschema_ray.pipelines.joins import hash_join

    joined = hash_join(
        read_thin(), avgs, on="l_partkey", right_on="p_key",
        num_partitions=_nparts(),
        right_schema=pa.schema([("p_key", pa.int64()),
                                ("sum_qty_c", pa.int64()),
                                ("n", pa.int64())]))

    def small(t: pa.Table) -> pa.Table:
        keep = (5 * t.column("qty_c").to_numpy()
                * t.column("n").to_numpy()) \
            < t.column("sum_qty_c").to_numpy()
        price = t.column("price_c").to_numpy()[keep]
        return pa.table({
            "price_sum_c": pa.array([int(price.sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64())})

    return _scalar_row(joined.map_batches(small, batch_format="pyarrow"),
                       ["price_sum_c", "n_items"])


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: nested EXISTS / NOT EXISTS
# ---------------------------------------------------------------------------

#: q21's exact F-orderkey broadcast bound: below this many ORDERS rows
#: the sorted F-key array (≤ ~8 B/row) broadcasts once and the orders
#: side never enters the shuffle; above it the tag-union fallback keeps
#: the semi-join fully distributed (a 50M-order broadcast is ~400 MB —
#: past what a worker heap should hold per query).
_Q21_FKEY_BROADCAST_MAX = 50_000_000


def q_q21_waiting_supplier(sf_dir: str):
    """TPC-H-Q21 (adapted: "late" is ``l_returnflag='R'`` — no
    commit/receipt dates): suppliers who were the ONLY flagged
    supplier on a multi-supplier F-status order. The official EXISTS /
    NOT-EXISTS pair over other lineitems of the same order is
    algebraized into two thin groupbys: (orderkey, suppkey)→max(flag)
    dedupe, then per-order (n_supp, n_flagged, argmax-flagged-supp) —
    EXISTS ⇔ n_supp ≥ 2, NOT EXISTS ⇔ n_flagged = 1. Scale shape:
    block-level pair dedupe before each shuffle; the orders join runs
    on the already-tiny per-order survivor stream; supplier names via
    broadcast LUT."""
    import pandas as pd
    import pyarrow.parquet as pq

    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_name"])
    sk = supp.column("s_suppkey").to_numpy()
    sname = np.empty(int(sk.max()) + 1, dtype=object)
    sname[sk] = supp.column("s_name").to_numpy(zero_copy_only=False)

    import ray
    from ray.data.context import ShuffleStrategy

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    nb = max(2, min(64, cpus))

    # ONE all-to-all: lineitem pairs AND F-order keys tag-union into
    # the same okey-hash buckets; both groupby levels + the status
    # semi-join run vectorized inside each bucket (a 3-shuffle chain
    # — pair groupby, per-order groupby, orders join — measured 20 s
    # vs DuckDB 0.64 s at sf0.1; this shape runs ~2 s).
    # Round-5: (supp, flag) pack into ONE int64 (sf = supp*2+flag,
    # orders sentinel -1) and the exchange runs through Ray's HASH
    # shuffle, scoped to this dataset's context — at ×50 data the sort
    # shuffle spent 32 s moving 32M thin rows where the hash exchange
    # with the packed 3-column schema does it in ~19 s (probe table in
    # BASELINE.md; growth 15.4× → ~9×).
    # Volume gates (both probes are parquet-metadata counts, no scan):
    # above ~15M lineitem rows the exchange flips to Ray's hash shuffle
    # (aggregator-actor startup ~3 s dominates at sf0.1 — 2.0 s sort vs
    # 5.0 s hash — but amortizes at volume: ×50 31.2 s sort → ~19 s
    # hash), and — when the F-orderkey set still fits a broadcast
    # (≤ _Q21_FKEY_BROADCAST_MAX) — the orders side leaves the shuffle
    # ENTIRELY: the sorted F-key array ships once via ray.put, the
    # lineitem partials drop non-F pairs at the map (EXACT semi-join,
    # ~half the pair rows on TPC-H status mix), and the in-bucket
    # membership check disappears. Beyond the broadcast bound the
    # tag-union fallback keeps the path fully distributed.
    n_li = _read(sf_dir, "lineitem", columns=["l_orderkey"]).count()
    big = n_li > 15_000_000
    fkeys_ref = None
    if big:
        n_ord = _read(sf_dir, "orders", columns=["o_orderkey"]).count()
        if n_ord <= _Q21_FKEY_BROADCAST_MAX:
            def fpart(t: pa.Table) -> pa.Table:
                t = t.filter(pc.equal(t.column("o_orderstatus"), "F"))
                return t.select(["o_orderkey"])

            chunks = [b.column("o_orderkey").to_numpy()
                      for b in _read(sf_dir, "orders",
                                     columns=["o_orderkey",
                                              "o_orderstatus"])
                      .map_batches(fpart, batch_format="pyarrow")
                      .iter_batches(batch_format="pyarrow")]
            fkeys_ref = ray.put(np.sort(np.concatenate(chunks))
                                if chunks else np.empty(0, np.int64))

    def pair_partial(t: pa.Table) -> pa.Table:
        flag = pc.equal(t.column("l_returnflag"), "R").cast(pa.int64())
        base = pa.table({"okey": t.column("l_orderkey"),
                         "supp": t.column("l_suppkey").cast(pa.int64()),
                         "flag": flag})
        g = base.group_by(["okey", "supp"]).aggregate([("flag", "max")]) \
            .rename_columns(["okey", "supp", "flag"])
        ok = g.column("okey").to_numpy()
        sf = g.column("supp").to_numpy() * 2 + g.column("flag").to_numpy()
        if fkeys_ref is not None:   # exact F-order prefilter at the map
            ks = ray.get(fkeys_ref)
            idx = np.searchsorted(ks, ok)
            idx[idx == len(ks)] = 0
            hit = (ks[idx] == ok) if len(ks) \
                else np.zeros(len(ok), bool)
            ok, sf = ok[hit], sf[hit]
            return pa.table({"okey": pa.array(ok), "sf": pa.array(sf),
                             "pb": pa.array((ok % nb).astype(np.int32))})
        return pa.table({"okey": g.column("okey"), "sf": pa.array(sf),
                         "pb": pa.array((ok % nb).astype(np.int32))})

    def ord_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderstatus"), "F"))
        ok = t.column("o_orderkey").to_numpy()
        return pa.table({"okey": pa.array(ok),
                         "sf": pa.array(np.full(len(ok), -1, np.int64)),
                         "pb": pa.array((ok % nb).astype(np.int32))})

    pairs = _read(sf_dir, "lineitem",
                  columns=["l_orderkey", "l_suppkey", "l_returnflag"]) \
        .map_batches(pair_partial, batch_format="pyarrow")

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        sfc = g["sf"].to_numpy()
        is_ord = sfc < 0
        fkeys = g.loc[is_ord, "okey"].to_numpy()
        p = g.loc[~is_ord]
        psf = p["sf"].to_numpy()
        pairs_ = pd.DataFrame({"okey": p["okey"].to_numpy(),
                               "supp": psf >> 1, "flag": psf & 1}) \
            .groupby(["okey", "supp"], as_index=False)["flag"].max()
        fl = pairs_["flag"].to_numpy()
        per_o = pd.DataFrame({
            "okey": pairs_["okey"], "one": 1, "flag": fl,
            "fs": pairs_["supp"].to_numpy() * fl}) \
            .groupby("okey", as_index=False) \
            .agg(n_supp=("one", "sum"), n_flagged=("flag", "sum"),
                 fsupp=("fs", "max"))
        keep = (per_o["n_supp"] >= 2) & (per_o["n_flagged"] == 1)
        if fkeys_ref is None:       # membership not pre-applied
            keep &= per_o["okey"].isin(fkeys)
        sel = per_o[keep]
        out = sel.groupby("fsupp", as_index=False).agg(n=("okey", "size"))
        out["n"] = out["n"].astype(np.int64)
        return out

    if fkeys_ref is not None:
        unioned = pairs               # orders side never shuffles
    else:
        forders = _read(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderstatus"]) \
            .map_batches(ord_partial, batch_format="pyarrow")
        unioned = pairs.union(forders)
    if big:
        # per-DATASET context: the global DataContext and every other
        # pipeline keep the default strategy
        unioned.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    parts = unioned.groupby("pb", num_partitions=nb) \
        .map_groups(bucket_merge, batch_format="pandas")

    # finish on the driver: the per-bucket partials are bounded by
    # |suppliers| per bucket and the result by |suppliers| total
    # (SF×10k — dimension-table small); a distributed aggregate +
    # sort here would add two more all-to-all barriers (each ~5-10 s
    # of fixed cost at this block count) to merge ≤128 tiny blocks
    batches = list(parts.iter_batches(batch_format="pandas"))
    if not batches:
        return pa.table({"s_name": pa.array([], pa.string()),
                         "numwait": pa.array([], pa.int64())})
    allp = pd.concat(batches, ignore_index=True)
    agg = allp.groupby("fsupp", as_index=False)["n"].sum() \
        .rename(columns={"n": "numwait"})
    agg["s_name"] = sname[agg["fsupp"].to_numpy()]
    agg = agg.sort_values(["numwait", "s_name"],
                          ascending=[False, True], kind="stable").head(100)
    return pa.table({
        "s_name": pa.array(agg["s_name"].to_numpy(), pa.string()),
        "numwait": pa.array(agg["numwait"].to_numpy().astype(np.int64))})


# ---------------------------------------------------------------------------
# Q22 — global-sales-opportunity: scalar AVG subquery + anti-join
# ---------------------------------------------------------------------------

_Q22_NATIONS = (1, 2, 3, 4, 5, 6, 7)
_Q22_CUTOFF = datetime.datetime(2000, 1, 1)


def q_q22_dormant_customers(sf_dir: str):
    """TPC-H-Q22 (adapted: the phone country-code prefix becomes a
    nationkey set — no c_phone — and, since every sf customer has
    ≥1 order, "no orders" becomes "no orders since 2000-01-01"):
    per-nation count + total balance of above-average-balance dormant
    customers. Scale shape: the scalar AVG subquery is a tree-reduced
    (sum, n) pair — the above-average test is the exact integer
    cross-multiplication ac·n > sum, no float division; the NOT
    EXISTS anti-join is a tag-union groupby (customers tag 0 with
    their attributes, recent-order custkeys block-deduped tag 1;
    Max-merge per custkey) so only 8-byte keys + small ints shuffle."""
    from ray.data.aggregate import Sum

    nat_set = pa.array(np.array(_Q22_NATIONS, np.int64))

    def cust_thin(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").cast(pa.int64())
        if isinstance(nk, pa.ChunkedArray):
            nk = nk.combine_chunks()
        t = t.append_column("nk", nk)
        return t.filter(pc.is_in(nk, value_set=nat_set))

    def read_cust():
        return _read(sf_dir, "customer",
                     columns=["c_custkey", "c_nationkey", "c_acctbal"]) \
            .map_batches(cust_thin, batch_format="pyarrow")

    # phase 1 — the scalar subquery: sum/count of positive balances
    def bal_partial(t: pa.Table) -> pa.Table:
        ac = _scale100(t.column("c_acctbal")).to_numpy()
        pos = ac[ac > 0]
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    stats = read_cust().map_batches(bal_partial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    tot, cnt = int(stats["s"] or 0), int(stats["n"] or 0)

    # phase 2 — tag-union anti-join of rich customers vs recent orders
    def rich(t: pa.Table) -> pa.Table:
        ac = _scale100(t.column("c_acctbal")).to_numpy()
        keep = ac * cnt > tot
        t = t.filter(pa.array(keep))
        return pa.table({"c_custkey": t.column("c_custkey"),
                         "cntrycode": t.column("nk"),
                         "acctbal_c": pa.array(ac[keep]),
                         "tag": pa.array(np.zeros(t.num_rows, np.int64))})

    def recent(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("o_orderdate"),
                                      pa.scalar(_Q22_CUTOFF)))
        col = t.column("o_custkey")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = pc.unique(col)
        none = pa.nulls(len(u), pa.int64())
        return pa.table({"c_custkey": u, "cntrycode": none,
                         "acctbal_c": none,
                         "tag": pa.array(np.ones(len(u), np.int64))})

    nb = _nbuckets()

    def add_pb(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy()
        return t.append_column("pb", pa.array((ck % nb).astype(np.int64)))

    cust = read_cust().map_batches(rich, batch_format="pyarrow") \
        .map_batches(add_pb, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
                   filter=(pc.field("o_orderdate") >= _Q22_CUTOFF)) \
        .map_batches(recent, batch_format="pyarrow") \
        .map_batches(add_pb, batch_format="pyarrow")

    # ONE all-to-all: rich customers + block-deduped recent-order keys
    # tag-union into custkey-hash buckets; the anti-join and per-nation
    # aggregation run vectorized per bucket; the ≤7-row result merges
    # on the driver
    import pandas as pd

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        okeys = g.loc[g["tag"] == 1, "c_custkey"].to_numpy()
        c = g.loc[g["tag"] == 0].copy()
        c = c[~c["c_custkey"].isin(okeys)]
        # re-narrow the null-padded balance to int64 before the sum
        c["acctbal_c"] = c["acctbal_c"].astype(np.int64)
        c["cntrycode"] = c["cntrycode"].astype(np.int64)
        out = c.groupby("cntrycode", as_index=False).agg(
            numcust=("c_custkey", "size"), tot=("acctbal_c", "sum"))
        return out.astype(np.int64)

    parts = cust.union(orders).groupby("pb") \
        .map_groups(bucket_merge, batch_format="pandas")
    return _driver_finish(
        parts, "cntrycode", ["numcust", "tot"],
        lambda agg: pa.table({
            "cntrycode": pa.array(agg["cntrycode"].to_numpy()
                                  .astype(np.int64)),
            "numcust": pa.array(agg["numcust"].to_numpy()
                                .astype(np.int64)),
            "totacctbal_c": pa.array(agg["tot"].to_numpy()
                                     .astype(np.int64))}))


TPCH_ORACLE: dict[str, str] = {
    "q6_forecast_revenue": r"""
SELECT CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice*l_discount*100 + 0.5)
                          AS BIGINT)), 0) AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    "q14_promo_revenue": r"""
SELECT CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN cents END), 0)
            AS BIGINT) AS promo_c,
       CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_c
FROM (SELECT CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
             AS BIGINT) AS cents, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate < TIMESTAMP '1996-10-01')
""",
    "q19_disjunctive_revenue": r"""
SELECT CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                          AS BIGINT)), 0) AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    "q4_order_priority": r"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    "q12_linestatus_priority": r"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
    "q13_customer_distribution": r"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey)
GROUP BY c_count
""",
    "q7_volume_shipping": r"""
SELECT 'NATION_' || CAST(n1.n_nationkey AS VARCHAR) AS supp_nation,
       'NATION_' || CAST(n2.n_nationkey AS VARCHAR) AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                AS BIGINT)) AS BIGINT) AS volume_c
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_nationkey = 3 AND n2.n_nationkey = 7)
    OR (n1.n_nationkey = 7 AND n2.n_nationkey = 3))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""",
    "q8_market_share": r"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n1.n_nationkey = 8
                THEN CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                     AS BIGINT) ELSE 0 END) AS BIGINT) AS nation_c,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                AS BIGINT)) AS BIGINT) AS total_c
FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
  AND r_name = 'EUROPE' AND s_nationkey = n1.n_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND p_type = 'PROMO'
GROUP BY 1
""",
    "q15_top_supplier": r"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS total_revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue_c
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM rev)
""",
    "q17_small_quantity": r"""
WITH sel AS (SELECT p_partkey FROM part
             WHERE p_brand = 'Brand#23' AND p_size <= 10),
li AS (SELECT l_partkey,
              CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS qty_c,
              CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS price_c
       FROM lineitem JOIN sel ON l_partkey = p_partkey),
agg AS (SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
               CAST(count(*) AS BIGINT) AS n
        FROM li GROUP BY l_partkey)
SELECT CAST(COALESCE(SUM(price_c), 0) AS BIGINT) AS price_sum_c,
       CAST(count(*) AS BIGINT) AS n_items
FROM li JOIN agg USING (l_partkey)
WHERE 5 * qty_c * n < sum_qty_c
""",
    "q21_waiting_supplier": r"""
WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS flag
  FROM lineitem GROUP BY 1, 2),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, SUM(flag) AS n_flagged,
         MAX(l_suppkey * flag) AS fsupp
  FROM pairs GROUP BY 1),
waits AS (
  SELECT fsupp FROM per_o JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F' AND n_supp >= 2 AND n_flagged = 1)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM waits JOIN supplier ON s_suppkey = fsupp
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
""",
    "q22_dormant_customers": r"""
WITH pos AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS cntrycode,
         CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS ac
  FROM customer WHERE c_nationkey BETWEEN 1 AND 7),
stats AS (SELECT CAST(SUM(ac) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n FROM pos WHERE ac > 0),
sel AS (SELECT pos.* FROM pos, stats WHERE ac * n > s),
dormant AS (
  SELECT * FROM sel
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                          WHERE o_orderdate >= TIMESTAMP '2000-01-01'))
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(ac) AS BIGINT) AS totacctbal_c
FROM dormant GROUP BY cntrycode
""",
}

TPCH_QUERIES = {
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q14_promo_revenue": q_q14_promo_revenue,
    "q19_disjunctive_revenue": q_q19_disjunctive_revenue,
    "q4_order_priority": q_q4_order_priority,
    "q12_linestatus_priority": q_q12_linestatus_priority,
    "q13_customer_distribution": q_q13_customer_distribution,
    "q7_volume_shipping": q_q7_volume_shipping,
    "q8_market_share": q_q8_market_share,
    "q15_top_supplier": q_q15_top_supplier,
    "q17_small_quantity": q_q17_small_quantity,
    "q21_waiting_supplier": q_q21_waiting_supplier,
    "q22_dormant_customers": q_q22_dormant_customers,
}
