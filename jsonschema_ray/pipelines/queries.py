"""Driver-facing query catalog: Ray pipelines + DuckDB oracle SQL.

Each entry is one operator/pipeline from SURVEY.md §2 (or a
training-data op), expressed twice:

- ``QUERIES[name](sf_dir)`` — the Ray Data implementation;
- ``ORACLE[name]`` — equivalent ANSI SQL DuckDB runs on the same
  parquet tables (views: region nation customer supplier part orders
  lineitem events documents embeddings).

Column names and dtypes match exactly between the two; float
aggregates are rounded on BOTH sides so distributed-vs-sequential
summation order can't flip the value hash. Entries without SQL
(``*`` rows-only: approximate / non-relational ops) are validated by
the pytest oracle instead.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsonschema_ray.sources.readers import DocSource

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def _read(sf_dir: str, table: str, columns=None, **kw):
    from jsonschema_ray.raycompat import read_parquet_clean

    return read_parquet_clean(_pq(sf_dir, table), columns=columns, **kw)


# ---------------------------------------------------------------------------
# validation-family queries (reference semantics over the sf tables)
# ---------------------------------------------------------------------------

_ALLOWED_LANGS = ["en", "fr", "es"]

# null-group-key sentinel — see raycompat.NULL_GROUP_KEY
from jsonschema_ray.raycompat import NULL_GROUP_KEY as _NULL_KEY  # noqa: E402
from jsonschema_ray.stages.hashagg import hash_group_agg  # noqa: E402


def q_val_lang_enum(sf_dir: str):
    """Enum-membership assertion (AssertionEqualsAny analog) as a
    violation scan: docs whose lang is outside the allowed set."""
    from jsonschema_ray.spec.predicates import compile_predicate

    kernel = compile_predicate(
        {"op": "is_in", "field": "lang", "values": _ALLOWED_LANGS})
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return ds.map_batches(lambda t: t.filter(pa.array(~kernel(t))),
                          batch_format="pyarrow")


def q_val_nchars_range(sf_dir: str):
    """Numeric-bounds assertion (AssertionTypeIntegerBounded analog):
    docs with n_chars outside [50, 500]."""
    from jsonschema_ray.spec.predicates import compile_predicate

    kernel = compile_predicate(
        {"op": "between", "field": "n_chars", "min": 50, "max": 500})
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return ds.map_batches(lambda t: t.filter(pa.array(~kernel(t))),
                          batch_format="pyarrow")


def q_val_unique_user(sf_dir: str):
    """Key-uniqueness check (doc_id_unique analog) on events.user_id:
    per-block partial counts → thin (key, count) groupby shuffle."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        col = t.column("user_id")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = col.drop_null().value_counts()
        return pa.table({"user_id": vc.field("values"),
                         "partial": vc.field("counts").cast(pa.int64())})

    ds = _read(sf_dir, "events", columns=["user_id"]).map_batches(
        partials, batch_format="pyarrow")
    totals = hash_group_agg(ds, "user_id", {"total": ("partial", "sum")})
    return totals.map_batches(
        lambda t: t.filter(pc.greater(t.column("total"), 1)),
        batch_format="pyarrow")


def q_val_ref_orders(sf_dir: str):
    """Referential check (media_ref→catalog analog): orders whose
    o_custkey is missing from the *restricted* customer catalog
    (c_custkey % 10 != 0 — drops ~10% so the anti-join is non-trivial)
    — broadcast key set + vectorized is_in, no shuffle."""
    import pyarrow.parquet as pq

    keys = pq.read_table(_pq(sf_dir, "customer"), columns=["c_custkey"]) \
        .column("c_custkey").combine_chunks()
    kn = keys.to_numpy(zero_copy_only=False)
    keys = pa.array(kn[kn % 10 != 0])

    def anti(t: pa.Table) -> pa.Table:
        col = t.column("o_custkey")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        present = pc.is_in(col, value_set=keys)
        return t.filter(pc.invert(present))

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return ds.map_batches(anti, batch_format="pyarrow")


def q_val_ref_orders_bloom(sf_dir: str):
    """Referential check, 10^12-TRIAGE tier: the same
    orders→restricted-customer check through the distributed Bloom
    filter (per-block partials → OR tree-merge → one broadcast probe
    pass). With ``hash_mode='md5'`` the Kirsch–Mitzenmacher positions
    are ``md5_number_lower/upper``, so DuckDB re-derives the exact BIT
    ARRAY and therefore the exact violation set — certain violations
    only; the ≈fpp that slip the probe slip identically in SQL. The
    one-sided guarantee itself (flagged ⊆ true, slip ≈ fpp) is pinned
    in ``tests/test_validate.py``."""
    from jsonschema_ray.pipelines.validate import (bloom_ref_check,
                                                   build_catalog_bloom)
    from jsonschema_ray.sources.readers import DatasetSource, ParquetSource

    def restrict(t: pa.Table) -> pa.Table:
        kn = t.column("c_custkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(kn % 10 != 0))

    cat = _read(sf_dir, "customer", columns=["c_custkey"]) \
        .map_batches(restrict, batch_format="pyarrow")
    bloom = build_catalog_bloom(DatasetSource(cat), "c_custkey",
                                hash_mode="md5")
    return bloom_ref_check(
        ParquetSource(_pq(sf_dir, "orders")), "o_custkey", bloom,
        columns=["o_orderkey"])


VAL_REF_ORDERS_BLOOM_SQL = r"""
WITH cat AS (
  SELECT c_custkey AS v FROM customer WHERE c_custkey % 10 <> 0
), mk AS (
  SELECT CAST(CEIL(-n * LN(0.01) / (LN(2) * LN(2))) AS BIGINT) AS m,
         CAST(ROUND(CEIL(-n * LN(0.01) / (LN(2) * LN(2))) / n * LN(2))
           AS BIGINT) AS k
  FROM (SELECT CAST(count(*) AS DOUBLE) AS n FROM cat)
), ks AS (
  SELECT unnest(generate_series(0, (SELECT k FROM mk) - 1)) AS i
), bits AS (
  SELECT DISTINCT
    CAST(((CAST(md5_number_lower(CAST(v AS VARCHAR)) AS HUGEINT)
           + i * (CAST(md5_number_upper(CAST(v AS VARCHAR)) AS HUGEINT)
                  | CAST(1 AS HUGEINT)))
          % 18446744073709551616) % (SELECT m FROM mk) AS BIGINT) AS p
  FROM cat CROSS JOIN ks
), probe AS (
  SELECT o_orderkey, o_custkey,
    CAST(((CAST(md5_number_lower(CAST(o_custkey AS VARCHAR)) AS HUGEINT)
           + i * (CAST(md5_number_upper(CAST(o_custkey AS VARCHAR))
                       AS HUGEINT) | CAST(1 AS HUGEINT)))
          % 18446744073709551616) % (SELECT m FROM mk) AS BIGINT) AS p
  FROM orders CROSS JOIN ks
)
SELECT DISTINCT probe.o_orderkey, probe.o_custkey
FROM probe LEFT JOIN bits ON bits.p = probe.p
WHERE bits.p IS NULL
"""


def q_val_ref_orders_join(sf_dir: str):
    """Referential check, LARGE-catalog flavour (SURVEY §2.4 #42): the
    same orders→restricted-customer check as ``q_val_ref_orders``, but
    through the engine's distributed hash anti-join path
    (``referential_violations_join``, ``spans_col=None``) — the route
    for catalogs too large to broadcast. Output is the engine's
    violation-row shape keyed (doc_id, rule_id, span_index)."""
    from jsonschema_ray.pipelines.validate import referential_violations_join
    from jsonschema_ray.sources.readers import DatasetSource
    from jsonschema_ray.spec.plan import Rule

    def restrict(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(k % 10 != 0))

    cat = _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        restrict, batch_format="pyarrow")
    rule = Rule(rule_id="ref_custkey", kind="ref",
                params={"field": "o_custkey", "catalog_key": "c_custkey"},
                message="o_custkey missing from customer catalog")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    out = referential_violations_join(
        DatasetSource(orders), rule, DatasetSource(cat), 8,
        doc_id_col="o_orderkey", spans_col=None)
    return out.drop_columns(["part"])


def q_stats_profile_documents(sf_dir: str):
    """Column-stats rule, exact flavour (count / nulls / distinct /
    min / max) — single-row profile of the documents table in ONE pass:
    mergeable per-block partials (count, min, max, null count, distinct
    lang SET — exact, since lang cardinality is tiny), merged on the
    driver from one thin row per block. Round-1 version scanned the
    table three times."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        nc = t.column("n_chars")
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lang = t.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        return pa.table({
            "n_docs": pa.array([t.num_rows], type=pa.int64()),
            "min_chars": pa.array([pc.min(nc).as_py()], type=pa.int64()),
            "max_chars": pa.array([pc.max(nc).as_py()], type=pa.int64()),
            "null_text": pa.array(
                [int(pc.sum(pc.is_null(txt)).as_py() or 0)], type=pa.int64()),
            "langs": pa.array([pc.unique(lang.drop_null()).to_pylist()],
                              type=pa.list_(pa.string())),
        })

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars", "text"])
    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .take_all()  # one thin row per block
    langs: set = set()
    for p in parts:
        langs.update(p["langs"])
    return pd.DataFrame([{
        "n_docs": int(sum(p["n_docs"] for p in parts)),
        "n_lang": len(langs),
        "null_text": int(sum(p["null_text"] for p in parts)),
        "min_chars": int(min(p["min_chars"] for p in parts)),
        "max_chars": int(max(p["max_chars"] for p in parts)),
    }])


# --- derived-span validation: the north-rule check family, SQL-checkable ---

_SPAN_KINDS5 = np.array(["text", "image", "audio", "table", "video"], dtype="U5")


def _derive_spans(doc_ids: np.ndarray):
    """Deterministic interleaved spans derived from integer doc ids —
    the same arithmetic is expressed in the oracle SQL, making the
    span-rule family (kind enum, conditional required, format,
    offset bounds/monotonicity) SQL-verifiable."""
    n_spans = (doc_ids % 3 + 1).astype(np.int64)
    parent = np.repeat(np.arange(len(doc_ids)), n_spans)
    starts = np.cumsum(n_spans) - n_spans
    s = np.arange(int(n_spans.sum()), dtype=np.int64) - np.repeat(starts, n_spans)
    d = doc_ids[parent]
    k = (d * 7 + s * 3) % 5
    kind = _SPAN_KINDS5[k]
    text = np.where((k == 0) & ((d + s) % 11 == 0), None,
                    np.where(k == 0, "tok", None))
    ref = np.where(k == 0, None,
                   np.where((d + s) % 13 == 0, "http://bad",
                            "media://0123456789abcdef"))
    offset = np.where((d % 23 == 0) & (s == 0), -1,
                      np.where((d % 17 == 0) & (s == 1), 0, s * 5))
    return n_spans, parent, s, kind, text, ref, offset.astype(np.int32)


def q_val_spans_documents(sf_dir: str):
    """Span-struct conformance over an interleaved table derived from
    ``documents``: runs the real CheckPlan row-local kernels
    (kind_enum, text_requires_text, media_requires_ref,
    media_ref_format, offset_nonnegative, offset_monotonic)."""
    from jsonschema_ray.sources.synth import SPAN_SCHEMA
    from jsonschema_ray.spec.plan import default_plan

    plan = default_plan().filtered(exclude=["doc_id_unique", "media_ref_exists"])
    plan_json = plan.to_json()
    # stateless TASKS with the per-worker checker cache, not an actor
    # pool: actor pools put the callable in the object store and a
    # late restart after GC fails (ray issue 53727) — observed once as
    # a RaySystemError in a 55-query marathon session
    from jsonschema_ray.stages.validator import _cached_checker
    cache_key = f"derive:{plan.plan_hash()}"

    def derive_and_check(t: pa.Table) -> pa.Table:
        checker = _cached_checker(cache_key, plan_json, None,
                                  "doc_id", "spans")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_spans, parent, s, kind, text, ref, offset = _derive_spans(ids)
        struct = pa.StructArray.from_arrays(
            [pa.array(kind, type=pa.string()),
             pa.array(text, type=pa.string(), from_pandas=True),
             pa.array(ref, type=pa.string(), from_pandas=True),
             pa.array(offset, type=pa.int32())],
            fields=list(SPAN_SCHEMA))
        offsets32 = np.concatenate(([0], np.cumsum(n_spans))).astype(np.int32)
        spans = pa.ListArray.from_arrays(
            pa.array(offsets32, type=pa.int32()), struct)
        docs = pa.table({"doc_id": pa.array(ids.astype("U20")),
                         "spans": spans})
        v = checker.violations(docs)
        return pa.table({
            "doc_id": v.column("doc_id"),
            "rule_id": v.column("rule_id"),
            "span_index": v.column("span_index").cast(pa.int64()),
        })

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return ds.map_batches(derive_and_check, batch_format="pyarrow")


_SPANS_SQL_CTE = """
WITH spans AS (
  SELECT d.doc_id AS did, s AS si,
         (d.doc_id*7 + s*3) % 5 AS k,
         CASE WHEN (d.doc_id % 23)=0 AND s=0 THEN -1
              WHEN (d.doc_id % 17)=0 AND s=1 THEN 0
              ELSE s*5 END AS off,
         CASE WHEN s=0 THEN NULL
              WHEN (d.doc_id % 23)=0 AND s-1=0 THEN -1
              WHEN (d.doc_id % 17)=0 AND s-1=1 THEN 0
              ELSE (s-1)*5 END AS prev_off
  FROM documents d
  JOIN (SELECT unnest(generate_series(0, 2)) AS s) g
    ON g.s <= (d.doc_id % 3)
)
"""

_SPANS_SQL = _SPANS_SQL_CTE + """
SELECT CAST(did AS VARCHAR) AS doc_id, 'kind_enum' AS rule_id, si AS span_index
  FROM spans WHERE k = 4
UNION ALL
SELECT CAST(did AS VARCHAR), 'text_requires_text', si
  FROM spans WHERE k = 0 AND (did + si) % 11 = 0
UNION ALL
SELECT CAST(did AS VARCHAR), 'media_ref_format', si
  FROM spans WHERE k <> 0 AND (did + si) % 13 = 0
UNION ALL
SELECT CAST(did AS VARCHAR), 'offset_nonnegative', si
  FROM spans WHERE off < 0
UNION ALL
SELECT CAST(did AS VARCHAR), 'offset_monotonic', si
  FROM spans WHERE si >= 1 AND off <= prev_off
"""


# ---------------------------------------------------------------------------
# relational / aggregate queries (engine breadth: groupby, shuffle, window)
# ---------------------------------------------------------------------------

def _scale100(arr) -> pa.Array:
    """floor(x*100 + 0.5) as int64 — the cross-engine-exact money/qty
    scaling: identical double ops on identical inputs ⇒ identical ints,
    and integer sums are order-independent (distributed summation of
    doubles is not)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))


def q_q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate over lineitem with predicate
    pushdown at the read (row-group pruning on l_shipdate). Money
    columns are aggregated as exact scaled-integer cents so the
    distributed sum matches the sequential oracle bit-for-bit."""
    import datetime

    from ray.data.aggregate import Count, Sum

    cutoff = datetime.datetime(1998, 9, 2)
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
               filter=(pc.field("l_shipdate") <= cutoff))

    def derive_partial(t: pa.Table) -> pa.Table:
        # per-block COMBINER (Arrow group_by, vectorized C++): the
        # groupby shuffle then carries ≤ |groups| rows per block (~6)
        # instead of one row per lineitem — a ~10^5 shuffle reduction
        # at sf0.1 and the pattern that holds at 100 TB.
        t = t.filter(pc.less_equal(t.column("l_shipdate"),
                                   pa.scalar(cutoff)))  # exact post-filter
        ext = t.column("l_extendedprice")
        disc_price = pc.multiply(ext, pc.subtract(1.0, t.column("l_discount")))
        charge = pc.multiply(disc_price, pc.add(1.0, t.column("l_tax")))
        derived = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty_c": _scale100(t.column("l_quantity")),
            "base_c": _scale100(ext),
            "disc_price_c": _scale100(disc_price),
            "charge_c": _scale100(charge),
            "discount_c": _scale100(t.column("l_discount")),
        })
        g = derived.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("base_c", "sum"), ("disc_price_c", "sum"),
             ("charge_c", "sum"), ("discount_c", "sum"), ("qty_c", "count")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "qty_c": g.column("qty_c_sum"),
            "base_c": g.column("base_c_sum"),
            "disc_price_c": g.column("disc_price_c_sum"),
            "charge_c": g.column("charge_c_sum"),
            "discount_c": g.column("discount_c_sum"),
            "n": g.column("qty_c_count"),
        })

    out = (ds.map_batches(derive_partial, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("qty_c", alias_name="sum_qty_c"),
                        Sum("base_c", alias_name="sum_base_price_c"),
                        Sum("disc_price_c", alias_name="sum_disc_price_c"),
                        Sum("charge_c", alias_name="sum_charge_c"),
                        Sum("discount_c", alias_name="sum_discount_c"),
                        Sum("n", alias_name="count_order")))

    q1_schema = pa.schema(
        [("l_returnflag", pa.string()), ("l_linestatus", pa.string())]
        + [(c, pa.int64()) for c in
           ("sum_qty_c", "sum_base_price_c", "sum_disc_price_c",
            "sum_charge_c", "sum_discount_c", "count_order", "avg_qty_c")])

    def finish(t: pa.Table) -> pa.Table:
        # Ray groupby emits zero-column blocks for empty partitions;
        # return a correctly-schemed empty table so downstream schema
        # unification doesn't warn ("RefBundle with a different schema").
        if t.num_rows == 0 or "sum_qty_c" not in t.schema.names:
            return q1_schema.empty_table()
        sq = t.column("sum_qty_c").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("count_order").to_numpy(zero_copy_only=False).astype(np.float64)
        avg_qty_c = np.floor(sq / n + 0.5).astype(np.int64)
        return t.append_column("avg_qty_c", pa.array(avg_qty_c))

    # return the ≤|returnflag×linestatus| aggregate as a TYPED Arrow
    # table: a fully-filtered-out input yields a ZERO-block dataset
    # whose to_pandas drops the schema entirely (Ray ignores empty
    # blocks), so the empty result would lose the oracle dtypes
    finished = out.map_batches(finish, batch_format="pyarrow")
    blocks = [b for b in finished.iter_batches(batch_format="pyarrow")
              if b.num_rows]
    if not blocks:
        return q1_schema.empty_table()
    return pa.concat_tables(
        [b.select(q1_schema.names) for b in blocks]).cast(q1_schema)


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (streaming analog, SURVEY.md §2.9):
    per-batch combiner pre-aggregation, then a small groupby of
    partials — the shuffle carries one row per (batch, key, hour)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hour=df["ts"].dt.floor("h"),
                       value_c=np.floor(df["value"].to_numpy() * 100.0 + 0.5)
                       .astype(np.int64))
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("value_c", "size"), sv=("value_c", "sum"))
        return g

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby(["event_type", "hour"]).aggregate(
        Sum("n", alias_name="n"), Sum("sv", alias_name="sum_value_c"))

    hourly_schema = pa.schema([
        ("event_type", pa.string()), ("hour", pa.timestamp("us")),
        ("n", pa.int64()), ("sum_value_c", pa.int64())])

    def cast_hour_us(t: pa.Table) -> pa.Table:
        # Ray's pandas block path promotes timestamps to ns; the oracle
        # (DuckDB TIMESTAMP) is us — emit us so dtype-strict compares match.
        if t.num_rows == 0 or "hour" not in t.schema.names:
            return hourly_schema.empty_table()
        i = t.schema.get_field_index("hour")
        return t.set_column(i, "hour", t.column("hour").cast(pa.timestamp("us")))

    return out.map_batches(cast_hour_us, batch_format="pyarrow")


def q_events_hopping(sf_dir: str):
    """HOPPING-window aggregate (size 1 h, hop 15 min — each event lands
    in exactly 4 overlapping windows): the sliding-window streaming
    analog SURVEY.md §2.9 doesn't get from tumbling windows. Replication
    is vectorized (np.tile over 4 hop offsets) and pre-aggregated per
    batch, so the shuffle carries (batch, event_type, window) partials,
    never the 4× event stream. Sums in exact scaled cents."""
    import pandas as pd

    from ray.data.aggregate import Sum

    HOPS = 4  # 1h window / 15min hop

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = df["ts"].dt.floor("15min")
        vc = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        starts = np.concatenate(
            [(base - pd.Timedelta(minutes=15 * i)).to_numpy()
             for i in range(HOPS)])
        rep = pd.DataFrame({
            "event_type": np.tile(df["event_type"].to_numpy(), HOPS),
            "wstart": starts,
            "vc": np.tile(vc, HOPS)})
        return rep.groupby(["event_type", "wstart"], as_index=False).agg(
            n=("vc", "size"), sv=("vc", "sum"))

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["event_type", "wstart"]).aggregate(
            Sum("n", alias_name="n"), Sum("sv", alias_name="sum_value_c"))

    schema = pa.schema([
        ("event_type", pa.string()), ("wstart", pa.timestamp("us")),
        ("n", pa.int64()), ("sum_value_c", pa.int64())])

    def cast_us(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "wstart" not in t.schema.names:
            return schema.empty_table()
        i = t.schema.get_field_index("wstart")
        return t.set_column(i, "wstart",
                            t.column("wstart").cast(pa.timestamp("us")))

    return out.map_batches(cast_us, batch_format="pyarrow")


def q_q3_top_orders(sf_dir: str):
    """TPC-H-Q3-style: dimension filter broadcast (customer segment),
    then ONE all-to-all — per-block per-order revenue partials and the
    filtered order keys tag-union into okey-hash buckets; each bucket
    completes the per-order sums, applies the semi-join, and emits its
    LOCAL top-10; the driver merges ≤10 rows per bucket (each extra
    join/groupby/sort barrier costs ~5-10 s fixed at this block count
    — measured on Q21). Revenue in exact scaled cents."""
    import datetime

    import pandas as pd
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.tpch import _driver_finish, _nbuckets

    seg_keys = pq.read_table(_pq(sf_dir, "customer"),
                             columns=["c_custkey", "c_mktsegment"])
    ck = seg_keys.filter(
        pc.equal(seg_keys.column("c_mktsegment"), "BUILDING")
    ).column("c_custkey").combine_chunks()

    cutoff = datetime.datetime(1998, 1, 1)
    nb = _nbuckets()

    def orders_filter(t: pa.Table) -> pa.Table:
        col = t.column("o_custkey")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keep = pc.and_(pc.is_in(col, value_set=ck),
                       pc.less(t.column("o_orderdate"), pa.scalar(cutoff)))
        t = t.filter(keep)
        ok = t.column("o_orderkey").to_numpy()
        null = pa.nulls(len(ok), pa.int64())
        return pa.table({"okey": pa.array(ok), "rev": null, "n": null,
                         "pb": pa.array((ok % nb).astype(np.int64))})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(orders_filter, batch_format="pyarrow")

    def li_partial(t: pa.Table) -> pa.Table:
        base = pa.table({
            "okey": t.column("l_orderkey"),
            "rev": _scale100(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(1.0, t.column("l_discount")))),
            "n": pa.array(np.ones(t.num_rows, np.int64))})
        g = base.group_by("okey").aggregate([("rev", "sum"), ("n", "sum")]) \
            .rename_columns(["okey", "rev", "n"])
        ok = g.column("okey").to_numpy()
        return g.append_column("pb", pa.array((ok % nb).astype(np.int64)))

    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_extendedprice",
                              "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow")

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        keys = g.loc[g["rev"].isna(), "okey"].to_numpy()
        li = g.loc[g["rev"].notna()].copy()
        # re-narrow null-padded cents to int64 before summing (float64
        # accumulation goes inexact past 2^53)
        li[["rev", "n"]] = li[["rev", "n"]].astype(np.int64)
        per_o = li.groupby("okey", as_index=False)[["rev", "n"]].sum()
        per_o = per_o[per_o["okey"].isin(keys)]
        per_o = per_o.sort_values(["rev", "okey"],
                                  ascending=[False, True]).head(10)
        return per_o.astype(np.int64)

    parts = lineitem.union(orders).groupby("pb") \
        .map_groups(bucket_top, batch_format="pandas")

    batches = list(parts.iter_batches(batch_format="pandas"))
    allp = pd.concat(batches, ignore_index=True) if batches \
        else pd.DataFrame({"okey": [], "rev": [], "n": []})
    top = allp.sort_values(["rev", "okey"],
                           ascending=[False, True]).head(10)
    return pa.table({
        "l_orderkey": pa.array(top["okey"].to_numpy().astype(np.int64)),
        "revenue_c": pa.array(top["rev"].to_numpy().astype(np.int64)),
        "n_items": pa.array(top["n"].to_numpy().astype(np.int64))})


def q_q5_local_supplier_volume(sf_dir: str):
    """TPC-H-Q5-style: revenue per nation where the customer and the
    supplier share a nation in one region. Scale shape: the dimension
    tables become broadcast numpy LUTs applied AT THE SCAN; the one
    big join (lineitem ⋈ orders) plus the equality filter and the
    per-nation aggregation all run in ONE all-to-all — both thin
    sides tag-union into okey-hash buckets, each bucket merges
    vectorized and emits ≤|nations| partial rows, and the driver
    sums the ≤5-row result."""
    import datetime

    import pandas as pd
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.tpch import _driver_finish, _nbuckets

    nation = pq.read_table(_pq(sf_dir, "nation"))
    region = pq.read_table(_pq(sf_dir, "region"))
    asia = region.filter(pc.equal(region.column("r_name"), "ASIA")) \
        .column("r_regionkey").combine_chunks()
    nat = nation.filter(pc.is_in(nation.column("n_regionkey"),
                                 value_set=asia))
    nat_name = dict(zip(nat.column("n_nationkey").to_pylist(),
                        nat.column("n_name").to_pylist()))

    def lut(table: pa.Table, key: str, val: str) -> np.ndarray:
        k = table.column(key).to_numpy()
        v = table.column(val).to_numpy()
        out = np.full(int(k.max()) + 1, -1, dtype=np.int64)
        out[k] = v
        return out

    supp_nat = lut(pq.read_table(_pq(sf_dir, "supplier"),
                                 columns=["s_suppkey", "s_nationkey"]),
                   "s_suppkey", "s_nationkey")
    cust_nat = lut(pq.read_table(_pq(sf_dir, "customer"),
                                 columns=["c_custkey", "c_nationkey"]),
                   "c_custkey", "c_nationkey")
    asia_set = set(nat_name)

    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    nb = _nbuckets()

    def orders_map(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
                       pc.less(t.column("o_orderdate"), pa.scalar(hi)))
        t = t.filter(keep)
        ok = t.column("o_orderkey").to_numpy()
        cn = cust_nat[t.column("o_custkey").to_numpy()]
        # only ASIA customers can satisfy the equality filter — prune
        # the shuffle to ~1/5 of orders here
        m = np.isin(cn, list(asia_set))
        ok, cn = ok[m], cn[m]
        return pa.table({"okey": pa.array(ok), "nat": pa.array(cn),
                         "rev": pa.nulls(len(ok), pa.int64()),
                         "pb": pa.array((ok % nb).astype(np.int64))})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(orders_map, batch_format="pyarrow")

    def li_map(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy()
        sn = supp_nat[t.column("l_suppkey").to_numpy()]
        m = np.isin(sn, list(asia_set))
        t = t.filter(pa.array(m))
        ok, sn = ok[m], sn[m]
        rev = _scale100(pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(1.0, t.column("l_discount"))))
        return pa.table({"okey": pa.array(ok), "nat": pa.array(sn),
                         "rev": rev,
                         "pb": pa.array((ok % nb).astype(np.int64))})

    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                              "l_discount"]) \
        .map_batches(li_map, batch_format="pyarrow")

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        li = g.loc[g["rev"].notna(), ["okey", "nat", "rev"]]
        o = g.loc[g["rev"].isna(), ["okey", "nat"]] \
            .rename(columns={"nat": "c_nat"})
        j = li.merge(o, on="okey", how="inner")
        j = j[j["nat"] == j["c_nat"]]
        out = j.groupby("nat", as_index=False)["rev"].sum()
        return out.astype(np.int64)

    parts = lineitem.union(orders).groupby("pb") \
        .map_groups(bucket_merge, batch_format="pandas")
    return _driver_finish(
        parts, "nat", "rev",
        lambda agg: pa.table({
            "n_name": pa.array([nat_name[int(n)] for n in agg["nat"]],
                               pa.string()),
            "revenue_c": pa.array(agg["rev"].to_numpy().astype(np.int64))}))


def q_events_running_window(sf_dir: str):
    """Running-window aggregate (streaming analog): per-user cumulative
    value sum + row number in (ts, event_id) order — the SQL
    ``SUM() OVER (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` re-expressed as ``groupby(user).map_groups`` over
    sorted groups. Partitioning assumption: one user's events fit one
    group (same contract as sessionization)."""
    import pandas as pd

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        vc = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "running_value_c": np.cumsum(vc),
            "row_n": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    return ds.groupby("user_id").map_groups(run, batch_format="pandas")


def q_string_funcs_documents(sf_dir: str):
    """§2.8 scalar-function breadth over strings: slice+upper, replace,
    length, element-wise concat — all single-pass Arrow kernels."""
    def f(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lang = t.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "head_upper": pc.utf8_upper(pc.utf8_slice_codeunits(txt, 0, 12)),
            "lang_up": pc.replace_substring(lang, "en", "EN"),
            "src_len": pc.utf8_length(src).cast(pa.int64()),
            "tag": pc.binary_join_element_wise(lang, src, "-"),
        })

    return _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"]) \
        .map_batches(f, batch_format="pyarrow")


def q_sort_topk_orders(sf_dir: str):
    """Global sort + limit (deterministic two-key ordering)."""
    def scale(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "totalprice_c": _scale100(t.column("o_totalprice"))})

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]) \
        .map_batches(scale, batch_format="pyarrow")
    return ds.sort(["totalprice_c", "o_orderkey"],
                   descending=[True, False]).limit(20)


def q_distinct_mktsegment(sf_dir: str):
    """Distinct values of one column (``Dataset.unique`` shuffle)."""
    ds = _read(sf_dir, "customer", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"mktsegment": pa.array(vals, type=pa.string())})


def q_val_props_payload(sf_dir: str):
    """Dynamic JSON-payload validation (the self-describing-object
    story: AssertionDefines + numeric bound over an untyped payload
    column): events whose ``props`` JSON lacks key ``k`` or has
    ``k ≥ 80``. Extraction is a vectorized RE2 fast path (payloads are
    flat JSON objects); a general engine would fall back to a JSON
    parser kernel for nested payloads."""
    def check(t: pa.Table) -> pa.Table:
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ext = pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)')
        kstr = ext.field("k") if ext.null_count < len(ext) else \
            pa.array([None] * len(ext), type=pa.string())
        k = kstr.cast(pa.int64())
        bad = pc.or_kleene(pc.is_null(k), pc.greater_equal(k, 80))
        out = pa.table({"event_id": t.column("event_id"), "k": k})
        return out.filter(bad.combine_chunks() if isinstance(bad, pa.ChunkedArray)
                          else bad)

    return _read(sf_dir, "events", columns=["event_id", "props"]).map_batches(
        check, batch_format="pyarrow")


_EVENT_PAYLOAD_SCHEMA = {
    "type": "object", "required": ["meta", "vals"],
    "properties": {
        "meta": {"type": "object", "required": ["type", "k"],
                 "properties": {
                     "type": {"enum": ["click", "view", "signup", "purchase"]},
                     "k": {"type": "integer", "maximum": 79}},
                 "additionalProperties": False},
        "vals": {"type": "array", "minItems": 1,
                 "items": {"type": "integer", "minimum": 1}},
    },
}

_JSCHEMA_WORKER_CACHE: dict[str, Any] = {}


def _worker_schema(key: str, schema: dict):
    """Per-worker compiled-schema cache: compile once per Ray worker
    process (the task-pool analog of actor ``__init__`` compilation)."""
    cs = _JSCHEMA_WORKER_CACHE.get(key)
    if cs is None:
        from jsonschema_ray.spec.jschema import compile_schema

        cs = _JSCHEMA_WORKER_CACHE[key] = compile_schema(schema)
    return cs


def q_val_schema_events(sf_dir: str):
    """NESTED JSON Schema validation through the dynamic evaluator
    (LoopProperties/LoopKeys analog, spec/jschema.py): a nested payload
    ``{"meta": {"type", "k"}, "vals": [user_id]}`` is assembled
    vectorized from event columns, then validated per doc against a
    2020-12 schema exercising nested required/enum/maximum,
    additionalProperties and array items. The oracle checks the same
    conditions directly on the source columns — fully independent of
    the JSON machinery. Scale shape: payload assembly + k-extraction
    are Arrow kernels; only the schema closure runs per row, compiled
    once per worker."""
    import json as _json

    def check(t: pa.Table) -> pa.Table:
        cs = _worker_schema("event_payload", _EVENT_PAYLOAD_SCHEMA)
        props = t.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        kstr = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)').field("k")
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        uid = t.column("user_id").cast(pa.string())
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        payload = pc.binary_join_element_wise(
            '{"meta": {"type": "', et, '", "k": ', kstr,
            '}, "vals": [', uid, "]}", "")
        bad = np.fromiter(
            (not cs.is_valid(_json.loads(s)) for s in payload.to_pylist()),
            dtype=bool, count=len(payload))
        return pa.table({"event_id": t.column("event_id")}).filter(pa.array(bad))

    return _read(sf_dir, "events",
                 columns=["event_id", "event_type", "user_id", "props"]) \
        .map_batches(check, batch_format="pyarrow")


_DOCS_SCHEMA = {
    "type": "object",
    "required": ["doc_id", "text"],
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "lang": {"enum": _ALLOWED_LANGS},
        "n_chars": {"type": "integer", "minimum": 50, "maximum": 500},
        "source": {"type": "string", "pattern": "^src", "maxLength": 4},
        "text": {"type": "string", "minLength": 1},
    },
}


def q_val_schema_documents(sf_dir: str):
    """The ``validate --schema schema.json`` front door as a pipeline:
    a real JSON Schema document describing the ``documents`` row shape
    is compiled to vectorized CheckPlan rules (schema_to_plan) and run
    via the standard row checker. Returns (doc_id, rule_id) violation
    keys; the oracle re-states each generated rule as plain SQL."""
    from jsonschema_ray.spec.jschema import schema_to_plan
    from jsonschema_ray.stages.validator import _cached_checker

    plan = schema_to_plan(_DOCS_SCHEMA)
    plan_json = plan.to_json()
    cache_key = f"docschema:{plan.plan_hash()}"

    def check(t: pa.Table) -> pa.Table:
        # stateless tasks + per-worker cache (see q_val_spans_documents
        # for why actor pools are avoided here)
        checker = _cached_checker(cache_key, plan_json, None,
                                  "doc_id", "spans")
        v = checker.violations(t)
        return pa.table({
            "doc_id": v.column("doc_id").cast(pa.int64()),
            "rule_id": v.column("rule_id"),
        })

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source", "n_chars"])
    return ds.map_batches(check, batch_format="pyarrow")


def q_events_top_per_user(sf_dir: str):
    """Window-function analog (ROW_NUMBER() = 1 per partition): each
    user's highest-value event, tie-broken by event_id — implemented as
    ``groupby(user).map_groups`` over sorted groups."""
    import pandas as pd

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"],
                          ascending=[False, True]).head(1)
        return g[["user_id", "event_id"]].assign(
            value_c=np.floor(g["value"].to_numpy() * 100.0 + 0.5)
            .astype(np.int64))

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "value"])
    return ds.groupby("user_id").map_groups(top1, batch_format="pandas")


def q_domain_cap(sf_dir: str):
    """Per-source document cap (the crawl-curation 'domain capping'
    step: at most K=15 docs per source, preferring longer documents,
    deterministic tiebreak): ROW_NUMBER() <= K per partition as a
    ``groupby(source).map_groups`` over sorted groups. Partitioning
    assumption: one source's docs fit one group; a web-scale hot
    domain would need a per-partition pre-cap (keep K per block, then
    the global cap — a strict superset passes through)."""
    import pandas as pd

    K = 15

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(K)
        return g[["doc_id", "source", "n_chars"]]

    ds = _read(sf_dir, "documents", columns=["doc_id", "source",
                                             "n_chars"])
    return ds.groupby("source").map_groups(cap, batch_format="pandas")


def q_events_sessionize(sf_dir: str):
    """Sessionization (streaming-shaped op, SURVEY.md §2.9): 30-minute
    inactivity gap splits sessions; per-user counts via
    ``groupby(user).map_groups`` over ts-sorted groups. Partitioning
    assumption: one user's events fit one group (holds for web-scale
    user activity; a hot key would need salted sub-sessions)."""
    import pandas as pd

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        gap = ts.diff() > pd.Timedelta(minutes=30)
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_sessions": [int(gap.sum()) + 1],
            "n_events": [len(g)],
        })

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def q_events_debounce(sf_dir: str):
    """Streaming debounce/throttle (§2.9): drop an event arriving
    within 60 s of the previous event of the same (user, type) —
    LAG semantics, the standard duplicate-burst suppressor. One hash
    shuffle on a user-hash BUCKET (256 real groups, never
    one-pandas-frame-per-user), vectorized shift/compare inside each
    bucket; ties broken by event_id exactly as the SQL window."""
    import pandas as pd

    from jsonschema_ray.functions.sketches import hash64

    def bucketize(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        pb = (hash64(u) % np.uint64(256)).astype(np.int32)
        return t.append_column("pb", pa.array(pb))

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          kind="mergesort")
        same = (g["user_id"].eq(g["user_id"].shift())
                & g["event_type"].eq(g["event_type"].shift()))
        close = (g["ts"] - g["ts"].shift()) < pd.Timedelta(seconds=60)
        keep = ~(same & close)
        out = g.loc[keep, ["event_id", "user_id", "event_type"]]
        return out.reset_index(drop=True)

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("pb").map_groups(debounce, batch_format="pandas")


def q_events_funnel(sf_dir: str):
    """Sequential-funnel conversion (§2.9 sequence analytics): users
    progressing view → click → purchase, each step within 24 h of the
    previous step's FIRST qualifying event (min-timestamp semantics —
    deterministic, no per-path search). Scale shape: one thin hash
    shuffle of (user, type, ts) rows into 256 user-hash buckets, all
    three stages computed with vectorized pandas merges inside each
    bucket; each bucket emits 3 partial-count rows, the final groupby
    carries 768 rows total."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from jsonschema_ray.functions.sketches import hash64

    W = pd.Timedelta(hours=24)

    def bucketize(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        value_set=pa.array(["view", "click", "purchase"]))
        t = t.filter(keep)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        pb = (hash64(u) % np.uint64(256)).astype(np.int32)
        return t.append_column("pb", pa.array(pb))

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        s1 = g[g.event_type == "view"].groupby("user_id")["ts"].min() \
            .rename("ts1").reset_index()
        c = g[g.event_type == "click"].merge(s1, on="user_id")
        c = c[(c.ts >= c.ts1) & (c.ts <= c.ts1 + W)]
        s2 = c.groupby("user_id")["ts"].min().rename("ts2").reset_index()
        p = g[g.event_type == "purchase"].merge(s2, on="user_id")
        p = p[(p.ts >= p.ts2) & (p.ts <= p.ts2 + W)]
        s3 = p.groupby("user_id")["ts"].min()
        return pd.DataFrame({
            "stage": ["view", "view>click", "view>click>purchase"],
            "n": np.array([len(s1), len(s2), len(s3)], np.int64)})

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("pb").map_groups(funnel, batch_format="pandas") \
        .groupby("stage").aggregate(Sum("n", alias_name="n_users"))


def q_latest_per_key(sf_dir: str):
    """CDC / upsert compaction: keep the latest record per key
    (user_id, by ts desc then event_id desc — a total order). Scale
    shape: each block first collapses to one candidate row per key it
    holds (vectorized lexsort, no shuffle of losing rows), then one
    hash shuffle into 256 key-hash buckets re-runs the identical
    keep-first kernel — never one Python group per key (10^9 keys at
    corpus scale)."""
    import pandas as pd

    from jsonschema_ray.functions.sketches import hash64

    cols = ["event_id", "user_id", "ts", "event_type", "value"]

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            ascending=[True, False, False],
                            kind="mergesort")
        out = df[~df["user_id"].duplicated()]
        return out[cols].reset_index(drop=True)

    def partial(t: pa.Table) -> pa.Table:
        df = keep_latest(t.select(cols).to_pandas())
        pb = (hash64(df["user_id"].to_numpy()) % np.uint64(256)) \
            .astype(np.int32)
        return pa.Table.from_pandas(df.assign(pb=pb),
                                    preserve_index=False)

    return _read(sf_dir, "events", columns=cols) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("pb").map_groups(
            lambda g: keep_latest(g), batch_format="pandas")


def q_events_retention(sf_dir: str):
    """Cohort retention matrix (§2.9 analytics): users cohorted by
    signup week (Monday-truncated, = SQL date_trunc('week')), counted
    once per (cohort, week-offset) they were active in. Scale shape:
    one thin (user, type, ts) shuffle into 256 user-hash buckets;
    inside each bucket the cohort join is a vectorized pandas merge;
    each bucket emits pre-counted (w0, wk, n) partials and the final
    groupby carries |cohorts×weeks| rows per bucket, never users."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from jsonschema_ray.functions.sketches import hash64

    DAY_US = 86_400_000_000

    def week_start(ts_us: np.ndarray) -> np.ndarray:
        # Monday-aligned week index: 1970-01-01 is a Thursday, so
        # day+3 is ≡0 (mod 7) exactly on Mondays — matches DuckDB's
        # date_trunc('week'). Floor-divide handles pre-epoch too.
        days = np.floor_divide(ts_us, DAY_US)
        wk = np.floor_divide(days + 3, 7)
        return (wk * 7 - 3) * DAY_US  # back to the Monday 00:00, in us

    def bucketize(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        pb = (hash64(u) % np.uint64(256)).astype(np.int32)
        return t.append_column("pb", pa.array(pb))

    def retention(g: pd.DataFrame) -> pd.DataFrame:
        # normalize to microseconds FIRST: blocks can arrive ns- or
        # us-precise (ns-written parquet vs the testdata us), and a
        # raw int64 view of ns computes week indices 1000x off
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")
        g = g.assign(wstart=week_start(ts_us.to_numpy()))
        su = g[g.event_type == "signup"].groupby("user_id")["wstart"] \
            .min().rename("w0").reset_index()
        act = g.merge(su, on="user_id")
        act = act[act["wstart"] >= act["w0"]]
        act = act.assign(
            wk=((act["wstart"] - act["w0"]) // (7 * DAY_US)).astype(np.int64))
        cells = act[["user_id", "w0", "wk"]].drop_duplicates() \
            .groupby(["w0", "wk"]).size().rename("n").reset_index()
        cells["w0"] = pd.to_datetime(cells["w0"], unit="us") \
            .astype("datetime64[us]")
        return cells

    def cast_us(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("w0"), "w0",
                            t.column("w0").cast(pa.timestamp("us")))

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("pb").map_groups(retention, batch_format="pandas") \
        .groupby(["w0", "wk"]).aggregate(Sum("n", alias_name="n_users")) \
        .map_batches(cast_us, batch_format="pyarrow")


def q_rollup_source_lang(sf_dir: str):
    """OLAP rollup (GROUPING SETS (source,lang) → (source) → ()): doc
    counts and char sums at all three levels from ONE input pass —
    per-block Arrow combiner collapses to |source×lang| partials, one
    thin groupby produces the leaf level, and the two super-aggregate
    levels re-aggregate the LEAF TABLE (tiny), never the input.
    ``level`` = GROUPING(source)*2 + GROUPING(lang) disambiguates
    'ALL' labels from literal values."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        lang = t.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        base = pa.table({
            "source": t.column("source"),
            "lang": lang.fill_null(_NULL_KEY),  # see _NULL_KEY
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "chars": t.column("n_chars").cast(pa.int64()),
        })
        g = base.group_by(["source", "lang"]).aggregate(
            [("n", "sum"), ("chars", "sum")])
        return g.rename_columns(["source", "lang", "n", "chars"])

    leaf = _read(sf_dir, "documents", columns=["source", "lang", "n_chars"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "lang"]).aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("chars", alias_name="sum_chars"))

    lt = leaf.take_all()  # ≤ |source×lang| rows by construction
    import pandas as pd

    lf = pd.DataFrame(lt)
    # a null-lang leaf renders as the SQL's COALESCE(lang, 'ALL');
    # the level id (0 vs 1) keeps it distinct from the super-aggregate
    lf["lang"] = lf["lang"].replace(_NULL_KEY, "ALL")
    lvl0 = lf.assign(level=np.int64(0))
    lvl1 = lf.groupby("source", as_index=False)[["n_docs", "sum_chars"]] \
        .sum().assign(lang="ALL", level=np.int64(1))
    lvl3 = pd.DataFrame([{
        "source": "ALL", "lang": "ALL",
        "n_docs": int(lf["n_docs"].sum()),
        "sum_chars": int(lf["sum_chars"].sum()), "level": np.int64(3)}])
    out = pd.concat([lvl0, lvl1, lvl3], ignore_index=True)
    return out[["level", "source", "lang", "n_docs", "sum_chars"]]


# ---------------------------------------------------------------------------
# temporal joins (pipelines/joins.py operators)
# ---------------------------------------------------------------------------

def _events_of_type(sf_dir: str, kind: str):
    cols = ["event_id", "user_id", "ts", "event_type"]

    def pick(t: pa.Table, k=kind) -> pa.Table:
        return t.filter(pc.equal(t.column("event_type"), k)) \
            .select(["event_id", "user_id", "ts"])

    return _read(sf_dir, "events", columns=cols).map_batches(
        pick, batch_format="pyarrow")


def q_asof_clicks(sf_dir: str):
    """As-of join: each purchase attributed to the same user's most
    recent at-or-before click (inner: unattributed purchases dropped).
    One hash shuffle on user_id, per-partition sorted merge — the
    distributed shape of pandas ``merge_asof`` (pipelines/joins.py)."""
    from jsonschema_ray.pipelines.joins import asof_join

    out = asof_join(_events_of_type(sf_dir, "purchase"),
                    _events_of_type(sf_dir, "click"),
                    by="user_id", on="ts",
                    left_columns=["event_id", "user_id", "ts"],
                    right_columns=["event_id", "user_id", "ts"],
                    how="inner")
    return out.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "click_id": t.column("event_id_r"),
            "click_ts": t.column("ts_r"),
        }), batch_format="pyarrow")


def q_interval_windows(sf_dir: str):
    """Broadcast interval (range) join: the 20 highest-value purchase
    events define ±10-minute incident windows; every event landing in a
    window (any user — a genuinely non-equi range predicate) is counted
    per window. Windows are driver-small by construction → broadcast
    once, zero shuffle; the final per-window reduce groups ≤ K keys.
    Money sums are scaled ints (value_cents) — cross-engine float SUM
    is order-dependent, int SUM is exact."""
    from ray.data.aggregate import Count, Sum

    from jsonschema_ray.pipelines.joins import broadcast_interval_join

    def purchases(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("event_type"), "purchase")) \
            .select(["event_id", "ts", "value"])

    top = _read(sf_dir, "events",
                columns=["event_id", "ts", "value", "event_type"]) \
        .map_batches(purchases, batch_format="pyarrow") \
        .sort(["value", "event_id"], descending=[True, False]) \
        .limit(20).to_pandas()
    delta = np.timedelta64(10, "m")
    windows = pa.table({
        "window_id": pa.array(top["event_id"], type=pa.int64()),
        "start": pa.array(top["ts"] - delta),
        "end": pa.array(top["ts"] + delta),
    })

    def cents(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "window_id": t.column("window_id"),
            "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    pairs = broadcast_interval_join(
        _read(sf_dir, "events", columns=["ts", "value"]), windows,
        time_col="ts", columns=["ts", "value"])
    return hash_group_agg(
        pairs.map_batches(cents, batch_format="pyarrow"), "window_id",
        {"n_events": ("cents", "size"),
         "value_cents": ("cents", "sum")})


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_token_count(sf_dir: str):
    from jsonschema_ray.pipelines.textops import add_token_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: add_token_count(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow")


def q_quality_counts(sf_dir: str):
    """Quality-scoring features as exact integer counts (ratios are
    left to consumers — integers hash identically across engines)."""
    from jsonschema_ray.pipelines.textops import PUNCT_RE, TOKEN_RE, LANG_PROFILES

    stop_pat = r"\b(" + "|".join(LANG_PROFILES["en"]) + r")\b"

    def counts(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.fill_null("")  # null text counts as empty
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.utf8_length(col).cast(pa.int64()),
            "n_tokens": pc.count_substring_regex(col, TOKEN_RE).cast(pa.int64()),
            "n_punct": pc.count_substring_regex(col, PUNCT_RE).cast(pa.int64()),
            "n_stop": pc.count_substring_regex(col, stop_pat).cast(pa.int64()),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow")


def q_gopher_rules(sf_dir: str):
    """The full Gopher quality-filter rule set (Rae et al. 2021) as a
    zero-shuffle vectorized map: integer rule counts + one bool flag per
    rule + overall ``passes`` — every ratio an exact integer
    cross-multiplication, so the oracle hash is dtype-exact."""
    from jsonschema_ray.pipelines.textops import add_gopher_flags

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda t: add_gopher_flags(t).drop_columns(["text"]),
                     batch_format="pyarrow")


def q_repetition_signals(sf_dir: str):
    """Gopher-style word-2-gram repetition signals (integer outputs →
    dtype-exact DuckDB oracle: per-doc gram counts re-derived with a
    self-join over ordered tokens)."""
    from jsonschema_ray.pipelines.textops import repetition_signals
    from jsonschema_ray.sources.readers import ParquetSource

    return repetition_signals(ParquetSource(_pq(sf_dir, "documents")))


def q_unigram_lm(sf_dir: str):
    """Unigram-LM surprisal score (corpus-trained, quantized integer
    sum → order-independent, ln == libm on both engines)."""
    from jsonschema_ray.pipelines.textops import unigram_lm_scores
    from jsonschema_ray.sources.readers import ParquetSource

    return unigram_lm_scores(ParquetSource(_pq(sf_dir, "documents")))


def q_langid(sf_dir: str):
    """Stopword-profile language ID (SQL-oracled: the same per-profile
    regex counts + first-max argmax, re-stated in DuckDB)."""
    from jsonschema_ray.pipelines.textops import add_langid

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: add_langid(t).select(["doc_id", "lang_pred"]),
        batch_format="pyarrow")


def _minhash_sql(num_perm: int = 64, bands: int = 16, seed: int = 1) -> str:
    """DuckDB SQL replicating ``minhash_candidate_pairs`` bit-exactly
    for ``token_hash=md5_hash64`` (== ``md5_number_lower``): the 64
    affine-permutation constants come from the SAME seeded generator as
    the engine (dedup.minhash_signatures), inlined as a VALUES table;
    uint64 wraparound arithmetic is emulated via HUGEINT ``% 2^64``.
    Assumes no band bucket exceeds the engine's max_bucket=256 (holds
    for the sf corpora; a truncated bucket would mismatch loudly)."""
    from jsonschema_ray.pipelines.dedup import _MERSENNE

    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    perm_rows = ", ".join(f"({p}, {int(a[p])}, {int(b[p])})"
                          for p in range(num_perm))
    F, TWO64 = 1099511628211, 1 << 64
    M61 = (1 << 61) - 1
    rpb = num_perm // bands
    piv = ",\n         ".join(
        f"max(CASE WHEN p % {rpb} = {j} THEN v END) AS v{j}"
        for j in range(rpb))
    fold = "CAST(v0 AS UBIGINT)"
    for j in range(1, rpb):
        fold = (f"xor(CAST((CAST({fold} AS HUGEINT) * {F}) % {TWO64} "
                f"AS UBIGINT), CAST(v{j} AS UBIGINT))")
    return rf"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r,
         md5_number_lower(tok) AS h
  FROM tp WHERE tok <> ''
), sh AS (
  SELECT t0.doc_id,
         (((CAST(t0.h AS HUGEINT) * {F}) % {TWO64} + t1.h) % {TWO64}
          * {F} + t2.h) % {TWO64} AS s
  FROM th t0
  JOIN th t1 ON t1.doc_id = t0.doc_id AND t1.r = t0.r + 1
  JOIN th t2 ON t2.doc_id = t0.doc_id AND t2.r = t0.r + 2
), perms(p, a, b) AS (
  VALUES {perm_rows}
), sig AS (
  SELECT doc_id, p,
         -- numpy uint64 semantics: a*sh and +b WRAP mod 2^64 before
         -- the mod-Mersenne reduction (engine runs errstate(over=ignore))
         min(((CAST(a AS HUGEINT) * s) % {TWO64} + b) % {TWO64} % {M61}) AS v
  FROM sh CROSS JOIN perms GROUP BY doc_id, p
), sigp AS (
  SELECT doc_id, CAST(p // {rpb} AS INTEGER) AS band,
         {piv}
  FROM sig GROUP BY 1, 2
), bh AS (
  SELECT doc_id, band, {fold} AS bhash FROM sigp
), pr AS (
  SELECT x.doc_id AS key_a, y.doc_id AS key_b
  FROM bh x JOIN bh y
    ON x.band = y.band AND x.bhash = y.bhash AND x.doc_id < y.doc_id
)
SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS n_bands,
       CAST(0 AS BIGINT) AS n_dropped
FROM pr GROUP BY 1, 2
"""


def _incremental_dedup_sql(threshold: float = 0.5) -> str:
    """Oracle for ``incremental_dedup``: the SAME LSH chain as
    ``_minhash_sql`` but candidate pairs cross the even(index)/odd(new)
    doc_id halves, verified by exact Jaccard over DISTINCT rolling
    shingle hashes — precisely the arithmetic the engine's stored
    blobs carry (md5 token hash end to end)."""
    base = _minhash_sql()
    head, _tail = base.split("), pr AS (", 1)
    return head + rf"""), pr AS (
  SELECT y.doc_id AS key_new, x.doc_id AS key_idx
  FROM bh x JOIN bh y
    ON x.band = y.band AND x.bhash = y.bhash
   AND x.doc_id % 2 = 0 AND y.doc_id % 2 = 1
  GROUP BY 1, 2
), sets AS (
  SELECT DISTINCT doc_id, s FROM sh
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id
), inter AS (
  SELECT p.key_new, p.key_idx, count(*) AS i
  FROM pr p
  JOIN sets a ON a.doc_id = p.key_idx
  JOIN sets b ON b.doc_id = p.key_new AND b.s = a.s
  GROUP BY 1, 2
)
SELECT p.key_new, p.key_idx,
       ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE)
             / (sn.n + si.n - COALESCE(i.i, 0)), 4) AS jaccard
FROM pr p
JOIN sizes sn ON sn.doc_id = p.key_new
JOIN sizes si ON si.doc_id = p.key_idx
LEFT JOIN inter i ON i.key_new = p.key_new AND i.key_idx = p.key_idx
WHERE CAST(COALESCE(i.i, 0) AS DOUBLE)
      / (sn.n + si.n - COALESCE(i.i, 0)) >= {threshold}
"""


def _langid_sql() -> str:
    """Oracle for q_langid, generated from the SAME LANG_PROFILES so the
    two stay in sync; argmax ties resolve to profile order (np.argmax
    takes the first maximum)."""
    from jsonschema_ray.pipelines.textops import LANG_PROFILES

    langs = list(LANG_PROFILES)
    counts = ", ".join(
        rf"len(regexp_extract_all(t, '\b({'|'.join(ws)})\b')) AS c_{lang}"
        for lang, ws in LANG_PROFILES.items())
    all_zero = " AND ".join(f"c_{lang} = 0" for lang in langs)
    case = f"WHEN {all_zero} THEN 'und' "
    for i, lang in enumerate(langs):
        geq = " AND ".join(f"c_{lang} >= c_{other}"
                           for other in langs[i + 1:]) or "TRUE"
        case += f"WHEN {geq} THEN '{lang}' "
    return (f"WITH d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents), "
            f"s AS (SELECT doc_id, {counts} FROM d) "
            f"SELECT doc_id, CASE {case}END AS lang_pred FROM s")


def _lsh_plane_lists(bits: int = 8, dim: int = 64, seed: int = 11) -> list[str]:
    """The SAME seeded hyperplanes as ``similarity.lsh_bucketed``
    (``np.random.default_rng(seed).normal(size=(bits, dim))``), each as
    a DuckDB DOUBLE[] literal (repr round-trips float64 exactly)."""
    planes = np.random.default_rng(seed).normal(size=(bits, dim))
    return ["[" + ", ".join(repr(float(w)) for w in row) + "]"
            for row in planes]


def _lsh_bucket_sql(expr: str, bits: int = 8, dim: int = 64,
                    seed: int = 11) -> str:
    """SQL for the hyperplane sign bucket of DOUBLE[] expression
    ``expr``. The engine signs the NORMALIZED embedding; dividing by a
    positive norm cannot flip an IEEE sign, so signing the raw vector
    is equivalent (``similarity.hyperplane_signatures``)."""
    terms = [
        f"(CASE WHEN list_dot_product({expr}, {lit}) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b, lit in enumerate(_lsh_plane_lists(bits, dim, seed))
    ]
    return "(" + " + ".join(terms) + ")"


def _ann_sql(k: int = 10, bits: int = 8, dim: int = 64,
             seed: int = 11) -> str:
    """Oracle for q_ann_topk: the LSH probe set (query bucket ± one
    bit) and the within-bucket exact cosine top-k, fully in SQL — the
    plane constants are inlined from the same seeded generator, so the
    approximate result is deterministic and SQL-checkable."""
    bucket = _lsh_bucket_sql("e", bits, dim, seed)
    probes = ", ".join(["q.qb"] + [f"xor(q.qb, {1 << b})"
                                   for b in range(bits)])
    return f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sig AS (
  SELECT vec_id, e, {bucket} AS bucket FROM emb
), q AS (
  SELECT e AS qe, bucket AS qb FROM sig WHERE vec_id = 0
)
SELECT s.vec_id,
       ROUND(list_cosine_similarity(s.e, q.qe), 3) AS cos_sim
FROM sig s, q
WHERE s.bucket IN ({probes})
ORDER BY cos_sim DESC, s.vec_id LIMIT {k}
"""


def _near_dup_emb_sql(threshold: float = 0.4, bits: int = 8,
                      dim: int = 64, seed: int = 11) -> str:
    """Oracle for q_near_dup_embeddings: same-bucket pair join +
    exact cosine threshold (engine thresholds UNROUNDED, rounds to 4
    for output). n_dropped is 0 whenever no bucket exceeds the
    engine's max_bucket=4096 — true for the sf corpora; a truncated
    bucket would mismatch loudly."""
    bucket = _lsh_bucket_sql("e", bits, dim, seed)
    return f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), sig AS (
  SELECT vec_id, e, {bucket} AS bucket FROM emb
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.e, b.e), 4) AS cos_sim,
       CAST(0 AS BIGINT) AS n_dropped
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= {threshold}
"""


def _decontam_sql(k: int = 5, bench_lt: int = 20) -> str:
    """Oracle for q_decontaminate: the SAME FNV rolling k-shingle
    chain as ``_minhash_sql`` (md5_number_lower token hash, uint64
    wraparound emulated via HUGEINT % 2^64), generalized to k tokens;
    benchmark = distinct shingles of docs with doc_id < ``bench_lt``,
    contamination = corpus shingle instances hitting that set."""
    F, TWO64 = 1099511628211, 1 << 64
    joins = "\n  ".join(
        f"JOIN th t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.r = t0.r + {j}"
        for j in range(1, k))
    fold = "CAST(t0.h AS HUGEINT)"
    for j in range(1, k):
        fold = f"(({fold} * {F}) % {TWO64} + t{j}.h) % {TWO64}"
    return rf"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r,
         md5_number_lower(tok) AS h
  FROM tp WHERE tok <> ''
), sh AS (
  SELECT t0.doc_id, {fold} AS s
  FROM th t0
  {joins}
), bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id < {bench_lt}
)
SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
FROM sh JOIN bench USING (s)
WHERE sh.doc_id >= {bench_lt}
GROUP BY sh.doc_id
"""


def _boilerplate_sql(k: int = 3, min_docs: int = 5) -> str:
    """Oracle for q_boilerplate_ngrams: the decontamination FNV chain
    with the benchmark set replaced by 'k-grams in ≥ min_docs distinct
    documents' (the MassiveText repeated-passage heuristic)."""
    F, TWO64 = 1099511628211, 1 << 64
    joins = "\n  ".join(
        f"JOIN th t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.r = t0.r + {j}"
        for j in range(1, k))
    fold = "CAST(t0.h AS HUGEINT)"
    for j in range(1, k):
        fold = f"(({fold} * {F}) % {TWO64} + t{j}.h) % {TWO64}"
    return rf"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r,
         md5_number_lower(tok) AS h
  FROM tp WHERE tok <> ''
), sh AS (
  SELECT t0.doc_id, {fold} AS s
  FROM th t0
  {joins}
), boiler AS (
  SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS c FROM sh GROUP BY s)
  WHERE c >= {min_docs}
), per_doc AS (
  SELECT sh.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(*) FILTER (WHERE b.s IS NOT NULL) AS BIGINT)
           AS n_boiler
  FROM sh LEFT JOIN boiler b USING (s)
  GROUP BY sh.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_boiler, 0) AS BIGINT) AS n_boiler
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


def _repeated_substr_sql(k: int = 3, min_docs: int = 2) -> str:
    """Oracle for q_repeated_substrings: the boilerplate FNV shingle
    chain + gaps-and-islands merge of repeated-gram positions into
    maximal spans."""
    F, TWO64 = 1099511628211, 1 << 64
    joins = "\n  ".join(
        f"JOIN th t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.r = t0.r + {j}"
        for j in range(1, k))
    fold = "CAST(t0.h AS HUGEINT)"
    for j in range(1, k):
        fold = f"(({fold} * {F}) % {TWO64} + t{j}.h) % {TWO64}"
    return rf"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r,
         md5_number_lower(tok) AS h
  FROM tp WHERE tok <> ''
), sh AS (
  SELECT t0.doc_id, t0.r - 1 AS pos, {fold} AS s
  FROM th t0
  {joins}
), rep AS (
  SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS c FROM sh GROUP BY s)
  WHERE c >= {min_docs}
), hits AS (
  SELECT sh.doc_id, sh.pos FROM sh JOIN rep USING (s)
), isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_tok,
       CAST(MAX(pos) + {k} AS BIGINT) AS end_tok,
       CAST(COUNT(*) AS BIGINT) AS n_shingles
FROM isl GROUP BY doc_id, grp
"""


def _substring_scrub_sql(k: int = 3, min_docs: int = 2) -> str:
    """Oracle for q_substring_scrub: the repeated-substring FNV chain
    + position-coverage expansion + per-doc string_agg re-render."""
    F, TWO64 = 1099511628211, 1 << 64
    joins = "\n  ".join(
        f"JOIN th t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.r = t0.r + {j}"
        for j in range(1, k))
    fold = "CAST(t0.h AS HUGEINT)"
    for j in range(1, k):
        fold = f"(({fold} * {F}) % {TWO64} + t{j}.h) % {TWO64}"
    return rf"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r,
         tok, md5_number_lower(tok) AS h
  FROM tp WHERE tok <> ''
), sh AS (
  SELECT t0.doc_id, t0.r AS r0, {fold} AS s
  FROM th t0
  {joins}
), rep AS (
  SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS c FROM sh GROUP BY s)
  WHERE c >= {min_docs}
), cov AS (
  SELECT DISTINCT sh.doc_id, sh.r0 + g.generate_series AS r
  FROM sh JOIN rep USING (s)
  CROSS JOIN generate_series(0, {k - 1}) g
), agg AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(*) FILTER (WHERE c.r IS NOT NULL) AS BIGINT)
           AS n_removed,
         COALESCE(string_agg(tok, ' ' ORDER BY t.r)
                    FILTER (WHERE c.r IS NULL), '') AS text_scrubbed
  FROM th t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.r = t.r
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_removed, 0) AS BIGINT) AS n_removed,
       COALESCE(a.text_scrubbed, '') AS text_scrubbed
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


def q_substring_scrub(sf_dir: str):
    """ExactSubstr-style REMOVAL (the apply half of
    q_repeated_substrings): tokens covered by any word-3-gram that
    recurs in ≥2 distinct documents are cut and the text re-renders
    from the survivors — two boilerplate-shaped passes (thin hash
    partials → one small groupby → capped broadcast set) plus a
    block-local delta-cumsum coverage mask; the text never shuffles.
    Bit-exactly SQL-oracled via the md5/FNV chain."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.dedup import repeated_substring_scrub
    from jsonschema_ray.sources.readers import ParquetSource

    return repeated_substring_scrub(
        ParquetSource(_pq(sf_dir, "documents")), key_col="doc_id",
        shingle_k=3, min_docs=2, token_hash=md5_hash64)


def q_repeated_substrings(sf_dir: str):
    """ExactSubstr-lite (Lee et al. 2022 dedup signal): maximal token
    spans whose every word-3-gram recurs in ≥2 distinct documents —
    two boilerplate-shaped passes plus a vectorized gaps-and-islands
    span merge; the text itself never shuffles."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.dedup import repeated_substrings
    from jsonschema_ray.sources.readers import ParquetSource

    return repeated_substrings(ParquetSource(_pq(sf_dir, "documents")),
                               key_col="doc_id", shingle_k=3, min_docs=2,
                               token_hash=md5_hash64)


def q_boilerplate_ngrams(sf_dir: str):
    """Cross-document boilerplate word-3-gram scrub signal: grams in
    ≥5 distinct docs form the boilerplate set (distributed distinct-doc
    counting → threshold → capped broadcast), each doc reports total
    vs boilerplate gram instances. Bit-exactly SQL-oracled via the
    md5/FNV shingle chain."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.dedup import boilerplate_ngram_stats
    from jsonschema_ray.sources.readers import ParquetSource

    return boilerplate_ngram_stats(
        ParquetSource(_pq(sf_dir, "documents")), "doc_id",
        shingle_k=3, min_docs=5, token_hash=md5_hash64)


def q_dedup_survivors_e2e(sf_dir: str):
    """The COMPLETE near-dup corpus dedup, end to end: MinHash-LSH
    candidates → exact Jaccard verify (≥0.5) → connected components →
    drop every non-root member → surviving (doc_id, n_chars). Oracled
    against the all-pairs exact edges + recursive-CTE closure in SQL,
    so one green row certifies the whole chain."""
    from jsonschema_ray.pipelines.dedup import (dedup_survivors,
                                                dup_clusters,
                                                minhash_verified_pairs)
    from jsonschema_ray.sources.readers import ParquetSource

    src = ParquetSource(_pq(sf_dir, "documents"))
    pairs = minhash_verified_pairs(src, "doc_id", threshold=0.5)
    clusters = dup_clusters(zip(pairs.column("key_a").to_pylist(),
                                pairs.column("key_b").to_pylist()))
    out = dedup_survivors(
        ParquetSource(_pq(sf_dir, "documents")), clusters, "doc_id")
    return out.select_columns(["doc_id", "n_chars"])


def q_embedding_quantize(sf_dir: str):
    """int8 affine scalar quantization of the embeddings table: per-
    dimension [lo,hi] from distributed min/max partials, codes =
    floor((x-lo)·254/(hi-lo)+0.5)-127. Long-format (vec_id, dim, code)
    integers → exact value-hash vs the same arithmetic in SQL."""
    from jsonschema_ray.pipelines.similarity import quantize_embeddings
    from jsonschema_ray.sources.readers import ParquetSource

    return quantize_embeddings(
        ParquetSource(_pq(sf_dir, "embeddings")))


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs (doc_id ≥ 20) sharing any word
    5-gram with the 'benchmark' slice (doc_id < 20); broadcast shingle
    set + streaming scan, bit-exactly SQL-oracled via the md5/FNV
    shingle chain."""
    import pyarrow.parquet as pq

    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.dedup import decontaminate
    from jsonschema_ray.sources.readers import DatasetSource

    t = pq.read_table(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
    bench = t.filter(pc.less(t.column("doc_id"), 20)).column("text") \
        .to_pylist()
    corpus = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b.column("doc_id"), 20)),
            batch_format="pyarrow")
    return decontaminate(DatasetSource(corpus), bench, shingle_k=5,
                         token_hash=md5_hash64)


def q_bloom_decontaminate(sf_dir: str):
    """Fixed-memory decontamination: the same benchmark/corpus split as
    ``decontaminate`` but through a 2^16-bit Bloom filter — distributed
    build (per-block distinct bit positions → distributed distinct),
    constant-size broadcast, per-doc flagged-instance counts INCLUDING
    the filter's deterministic false positives, so the whole operator
    (FNV shingle chain + multiply-shift bit positions) re-derives
    bit-exactly in DuckDB."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.dedup import bloom_decontaminate
    from jsonschema_ray.sources.readers import DatasetSource

    bench = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda b: b.filter(
            pc.less(b.column("doc_id"), 20)), batch_format="pyarrow")
    corpus = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b.column("doc_id"), 20)),
            batch_format="pyarrow")
    return bloom_decontaminate(DatasetSource(corpus), DatasetSource(bench),
                               shingle_k=5, token_hash=md5_hash64)


def q_dsir_scores(sf_dir: str):
    """DSIR importance scores: hashed-unigram (8192 buckets) target
    (doc_id < 20) vs raw (doc_id ≥ 20) log-ratio model; per-doc score
    is an exact int64 micro-nat dot product — block-layout-invariant
    and bit-replicated in DuckDB (md5 bucket hash + identical double
    expression for the quantized log-ratios)."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.textops import dsir_scores
    from jsonschema_ray.sources.readers import DatasetSource

    tgt = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda b: b.filter(
            pc.less(b.column("doc_id"), 20)), batch_format="pyarrow")
    raw = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b.column("doc_id"), 20)),
            batch_format="pyarrow")
    return dsir_scores(DatasetSource(raw), DatasetSource(tgt),
                       token_hash=md5_hash64)


def _dsir_sql(bench_lt: int = 20, n_buckets: int = 8192) -> str:
    """Oracle for q_dsir_scores: md5 token hash + multiply-shift bucket
    (split-multiply mod-2^64 emulation), Laplace-smoothed per-bucket
    ln-ratio quantized to micro-nats with the IDENTICAL double
    expression as numpy, integer dot product per document."""
    TWO64 = 1 << 64
    shift_div = TWO64 // n_buckets
    return rf"""
WITH tp AS (
  SELECT doc_id, unnest(regexp_split_to_array(COALESCE(text, ''), '\s+'))
    AS tok
  FROM documents
), tb AS (
  SELECT doc_id,
         CAST((((CAST(md5_number_lower(tok) AS HUGEINT) // 4294967296)
                * 11400714819323198485) % 4294967296) * 4294967296
               + (CAST(md5_number_lower(tok) AS HUGEINT) % 4294967296)
               * 11400714819323198485 + 1 AS HUGEINT) % {TWO64}
           // {shift_div} AS b
  FROM tp WHERE tok <> ''
), tgt AS (
  SELECT b, count(*) AS c FROM tb WHERE doc_id < {bench_lt} GROUP BY b
), raw AS (
  SELECT b, count(*) AS c FROM tb WHERE doc_id >= {bench_lt} GROUP BY b
), tot AS (
  SELECT (SELECT COALESCE(SUM(c), 0) FROM tgt) AS t_tot,
         (SELECT COALESCE(SUM(c), 0) FROM raw) AS r_tot
), lam AS (
  SELECT ob.b,
         CAST(floor(1e6 * (ln((COALESCE(tgt.c, 0) + CAST(1 AS DOUBLE))
                              / (t_tot + {n_buckets}))
                           - ln((COALESCE(raw.c, 0) + CAST(1 AS DOUBLE))
                                / (r_tot + {n_buckets}))) + 0.5)
           AS BIGINT) AS l
  FROM (SELECT DISTINCT b FROM tb) ob
  LEFT JOIN tgt ON tgt.b = ob.b
  LEFT JOIN raw ON raw.b = ob.b
  CROSS JOIN tot
), doc AS (
  SELECT doc_id, b, count(*) AS c FROM tb WHERE doc_id >= {bench_lt}
  GROUP BY doc_id, b
), scored AS (
  SELECT doc.doc_id, CAST(SUM(doc.c * lam.l) AS BIGINT) AS score_q,
         CAST(SUM(doc.c) AS BIGINT) AS n_tokens
  FROM doc JOIN lam ON lam.b = doc.b GROUP BY doc.doc_id
)
SELECT d.doc_id, COALESCE(s.score_q, 0) AS score_q,
       COALESCE(s.n_tokens, 0) AS n_tokens
FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
WHERE d.doc_id >= {bench_lt}
"""


# GPT-2-style BPE pre-tokenizer pattern, RE2-safe (the upstream pattern's
# trailing-space lookahead is dropped: RE2 has no lookahead, and the \s+
# fallback subsumes it for counting purposes)
BPE_PRETOKEN_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
                   r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def q_bpe_token_count(sf_dir: str):
    """BPE-ish token counting: the GPT-2 pre-tokenizer regex (letters /
    numbers / punctuation runs + contraction suffixes) counted per
    document next to the whitespace count — the standard
    training-budget estimator. One vectorized RE2 pass, zero shuffle;
    DuckDB runs the identical pattern."""
    def counts(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.fill_null("")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_ws_tokens": pc.count_substring_regex(col, r"\S+")
            .cast(pa.int64()),
            "n_bpe_pretokens": pc.count_substring_regex(
                col, BPE_PRETOKEN_RE).cast(pa.int64()),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(counts, batch_format="pyarrow")


def q_normalize_text(sf_dir: str):
    """Curation-grade text normalization: NFC → lowercase → whitespace
    collapse → trim, emitted with a changed flag and the normalized
    length — the canonicalization pass that precedes exact dedup in web
    pipelines. Pure vectorized Arrow kernels (utf8_normalize /
    utf8_lower / RE2 replace), zero shuffle; DuckDB mirrors with
    nfc_normalize/lower/regexp_replace."""
    def norm(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.fill_null("")
        n = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_lower(pc.utf8_normalize(col, form="NFC")),
            r"\s+", " "))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "norm_text": n,
            "changed": pc.not_equal(n, col),
            "n_chars_norm": pc.utf8_length(n).cast(pa.int64()),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(norm, batch_format="pyarrow")


def q_dsir_select(sf_dir: str):
    """The DSIR SELECTION step: top-100 raw-corpus documents by
    importance score (exact int64 micro-nats, doc_id tie-break) — the
    deterministic stand-in for gumbel-top-k resampling. Distributed
    sort+limit over the score table; the text never moves."""
    return q_dsir_scores(sf_dir).sort(
        ["score_q", "doc_id"], descending=[True, False]).limit(100)


def q_repetition_suite(sf_dir: str):
    """The full Gopher within-doc repetition signal set: top-{2,3,4}
    n-gram char coverage + duplicate-{5..10}-gram char coverage, all
    exact integers (consumers form the threshold fractions). Zero
    shuffle — 9 vectorized passes over the batch-flat token stream;
    the md5/FNV chain re-derives every column in DuckDB."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.textops import repetition_suite
    from jsonschema_ray.sources.readers import ParquetSource

    return repetition_suite(ParquetSource(_pq(sf_dir, "documents")),
                            token_hash=md5_hash64)


def _repetition_suite_sql() -> str:
    """Oracle for q_repetition_suite: per n in 2..10 an n-token
    self-join gram CTE carrying the FNV fold hash (engine tie-break)
    and the gram char length; top-gram by (count desc, fold asc),
    duplicate coverage by DISTINCT covered token rows (no double
    counting, same as the engine's per-token marking)."""
    F, TWO64 = 1099511628211, 1 << 64
    parts = []
    finals = []
    for n in range(2, 11):
        joins = "\n  ".join(
            f"JOIN th t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.r = t0.r + {j}"
            for j in range(1, n))
        fold = "CAST(t0.h AS HUGEINT)"
        wlen = "t0.l"
        for j in range(1, n):
            fold = f"(({fold} * {F}) % {TWO64} + t{j}.h) % {TWO64}"
            wlen += f" + t{j}.l"
        parts.append(f"""g{n} AS (
  SELECT t0.doc_id, t0.r, {fold} AS f, {wlen} + {n - 1} AS w
  FROM th t0
  {joins}
), c{n} AS (
  SELECT doc_id, f, count(*) AS cnt, MIN(w) AS w
  FROM g{n} GROUP BY doc_id, f
)""")
        if n <= 4:
            parts.append(f"""t{n}x AS (
  SELECT doc_id, CAST(cnt * w AS BIGINT) AS chars
  FROM (SELECT doc_id, cnt, w,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, f ASC) AS rk
        FROM c{n}) WHERE rk = 1
)""")
            finals.append(
                f"COALESCE(t{n}x.chars, 0) AS top{n}_chars")
        else:
            parts.append(f"""d{n}x AS (
  SELECT doc_id, CAST(SUM(l) AS BIGINT) AS chars FROM (
    SELECT DISTINCT g.doc_id, t.r, t.l
    FROM g{n} g
    JOIN c{n} c ON c.doc_id = g.doc_id AND c.f = g.f AND c.cnt >= 2
    JOIN th t ON t.doc_id = g.doc_id
            AND t.r BETWEEN g.r AND g.r + {n - 1}
  ) GROUP BY doc_id
)""")
            finals.append(
                f"COALESCE(d{n}x.chars, 0) AS dup{n}_chars")
    sel_joins = "\n".join(
        f"LEFT JOIN t{n}x ON t{n}x.doc_id = d.doc_id" if n <= 4 else
        f"LEFT JOIN d{n}x ON d{n}x.doc_id = d.doc_id"
        for n in range(2, 11))
    return rf"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r,
         md5_number_lower(tok) AS h, length(tok) AS l
  FROM tp WHERE tok <> ''
), tc AS (
  SELECT doc_id, CAST(SUM(l) AS BIGINT) AS tok_chars FROM th
  GROUP BY doc_id
), {", ".join(parts)}
SELECT d.doc_id, COALESCE(tc.tok_chars, 0) AS tok_chars,
       {", ".join(finals)}
FROM documents d
LEFT JOIN tc ON tc.doc_id = d.doc_id
{sel_joins}
"""


def _bloom_decontam_sql(k: int = 5, bench_lt: int = 20,
                        n_bits: int = 1 << 16, depth: int = 4) -> str:
    """Oracle for q_bloom_decontaminate: the `_decontam_sql` FNV shingle
    chain, with the exact benchmark set replaced by the Bloom filter's
    bit positions — multiply-shift high bits of the mod-2^64 affine
    product, uint64 wraparound emulated via the 32-bit split multiply
    (every intermediate < 2^97, no INT128 overflow)."""
    F, TWO64 = 1099511628211, 1 << 64
    joins = "\n  ".join(
        f"JOIN th t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.r = t0.r + {j}"
        for j in range(1, k))
    fold = "CAST(t0.h AS HUGEINT)"
    for j in range(1, k):
        fold = f"(({fold} * {F}) % {TWO64} + t{j}.h) % {TWO64}"
    ks = ",\n         ".join(
        f"({i}, CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"
        for i, (a, b) in enumerate(zip(
            (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)[:depth],
            (1, 3, 5, 7)[:depth])))
    pos = (f"(((s // 4294967296) * kk.a) % 4294967296) * 4294967296"
           f" + (s % 4294967296) * kk.a + kk.b")
    pos = f"CAST((({pos}) % {TWO64}) // {TWO64 // n_bits} AS BIGINT)"
    return rf"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r,
         md5_number_lower(tok) AS h
  FROM tp WHERE tok <> ''
), sh AS (
  SELECT t0.doc_id, row_number() OVER () AS inst, {fold} AS s
  FROM th t0
  {joins}
), kk(i, a, b) AS (
  VALUES {ks}
), bloom AS (
  SELECT DISTINCT {pos} AS p
  FROM sh CROSS JOIN kk WHERE doc_id < {bench_lt}
), hits AS (
  SELECT sh.doc_id, sh.inst
  FROM sh CROSS JOIN kk
  JOIN bloom ON bloom.p = {pos}
  WHERE sh.doc_id >= {bench_lt}
  GROUP BY sh.doc_id, sh.inst
  HAVING count(*) = {depth}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged
FROM hits GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def q_dedup_exact_summary(sf_dir: str):
    import pandas as pd

    from jsonschema_ray.pipelines.dedup import exact_dedup_summary
    from jsonschema_ray.sources.readers import ParquetSource

    out = exact_dedup_summary(ParquetSource(_pq(sf_dir, "documents")), "doc_id")
    return pd.DataFrame([out])


def q_dedup_prefix_groups(sf_dir: str):
    """Fingerprint dedup at prefix granularity: groups of docs sharing
    a 20-char prefix (hash-partition + per-group min survivor)."""
    from ray.data.aggregate import Count, Min

    def prefix(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.fill_null("")  # null text dedups as empty
        return pa.table({"prefix": pc.utf8_slice_codeunits(col, 0, 20),
                         "doc_id": t.column("doc_id")})

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        prefix, batch_format="pyarrow")
    g = hash_group_agg(ds, "prefix", {"n_copies": ("doc_id", "size"),
                                      "keep_id": ("doc_id", "min")})
    return g.map_batches(lambda t: t.filter(pc.greater(t.column("n_copies"), 1)),
                         batch_format="pyarrow")


def q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-duplicate candidate pairs, SQL-oracled: with
    the ``md5_hash64`` token hash (== DuckDB ``md5_number_lower``) the
    whole chain — FNV rolling 3-shingle combine, 64 seed-fixed affine
    permutations mod 2^61-1, per-band FNV-XOR fold, bucket pairing —
    is re-derivable bit-exactly in SQL (see ORACLE['minhash_pairs'],
    generated by ``_minhash_sql`` from the same constants)."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.dedup import minhash_candidate_pairs
    from jsonschema_ray.sources.readers import ParquetSource

    return minhash_candidate_pairs(ParquetSource(_pq(sf_dir, "documents")),
                                   "doc_id", token_hash=md5_hash64)


def q_minhash_verified(sf_dir: str):
    """LSH candidates verified by exact word-3-shingle Jaccard
    (threshold 0.5). SQL-oracled against the ALL-pairs exact-Jaccard
    set, so a green row certifies both the verification arithmetic and
    LSH recall = 1.0 on this corpus."""
    from jsonschema_ray.pipelines.dedup import minhash_verified_pairs
    from jsonschema_ray.sources.readers import ParquetSource

    return minhash_verified_pairs(ParquetSource(_pq(sf_dir, "documents")),
                                  "doc_id", threshold=0.5)


def q_minhash_verified_joined(sf_dir: str):
    """Same result contract as ``minhash_verified`` but FORCED through
    the distributed two-join text-fetch path (broadcast disabled) —
    the 100-TB shape where candidates are O(corpus). Green under the
    same all-pairs SQL oracle certifies the join path end to end."""
    from jsonschema_ray.pipelines.dedup import minhash_verified_pairs
    from jsonschema_ray.sources.readers import ParquetSource

    return minhash_verified_pairs(ParquetSource(_pq(sf_dir, "documents")),
                                  "doc_id", threshold=0.5,
                                  broadcast_max_pairs=0)


def q_unigram_lm_topk(sf_dir: str):
    """Unigram-LM with a REAL top-K vocabulary truncation (K=5 of the
    corpus's 31 distinct tokens): kept tokens score exactly, dropped
    tokens take the max-surprise count=1 bucket. SQL-oracled with the
    same ranked-truncation re-stated in DuckDB — certifies the
    distributed groupby→sort→limit vocabulary path in the driver gate."""
    from jsonschema_ray.pipelines.textops import unigram_lm_scores
    from jsonschema_ray.sources.readers import ParquetSource

    return unigram_lm_scores(ParquetSource(_pq(sf_dir, "documents")),
                             vocab_top_k=5)


def q_embedding_decontaminate(sf_dir: str):
    """Semantic decontamination: corpus vectors (label≠0) within
    cosine 0.4 of ANY benchmark vector (label=0) are flagged with
    their best benchmark attribution — benchmark matrix broadcast
    once, zero-shuffle matmul scan (the embedding analog of the
    n-gram decontaminate query)."""
    from jsonschema_ray.pipelines.similarity import embedding_decontaminate
    from jsonschema_ray.sources.readers import ParquetSource

    return embedding_decontaminate(
        ParquetSource(_pq(sf_dir, "embeddings")), threshold=0.4)


def q_quality_filter(sf_dir: str):
    """Operator composition: exact distributed quantiles (p10/p90 of
    n_chars, selection WITHOUT a global sort) feed a broadcast
    range-filter — the percentile-based outlier scrub of corpus
    curation. The quantile pass streams histograms; the filter is a
    zero-shuffle per-batch mask."""
    from jsonschema_ray.pipelines.stats import exact_quantiles
    from jsonschema_ray.sources.readers import ParquetSource

    src = ParquetSource(_pq(sf_dir, "documents"))
    qt = exact_quantiles(src, "n_chars", [0.1, 0.9])
    lo, hi = qt.column("value").to_pylist()

    def keep(t: pa.Table) -> pa.Table:
        n = t.column("n_chars")
        if isinstance(n, pa.ChunkedArray):
            n = n.combine_chunks()
        m = pc.and_(pc.greater_equal(n, lo), pc.less_equal(n, hi))
        return t.filter(m)

    return src.dataset(columns=["doc_id", "n_chars"]) \
        .map_batches(keep, batch_format="pyarrow")


def q_zscore_outliers(sf_dir: str):
    """Per-group standardization: exact integer moment sums per
    event_type (one tiny row per group shuffles) broadcast back for a
    zero-shuffle |z|>2 flagging pass, z quantized for an exact
    cross-engine hash."""
    from jsonschema_ray.pipelines.stats import zscore_outliers
    from jsonschema_ray.sources.readers import ParquetSource

    return zscore_outliers(ParquetSource(_pq(sf_dir, "events")),
                           value_col="value", group_col="event_type",
                           threshold=2.0, id_col="event_id")


def q_semdedup(sf_dir: str):
    """SemDeDup over the embeddings table: deterministic k-means (k=8)
    + within-cluster cosine pruning at 0.9, keeping the
    lowest-centroid-similarity representative. Iterative k-means ⇒
    rows-only driver check; distributed ≡ local and planted-duplicate
    pruning are pinned in tests."""
    from jsonschema_ray.pipelines.similarity import semdedup
    from jsonschema_ray.sources.readers import ParquetSource

    return semdedup(ParquetSource(_pq(sf_dir, "embeddings")),
                    k=8, iters=5, threshold=0.9)


def q_kmeans_embeddings(sf_dir: str):
    """* rows-only: distributed Lloyd's k-means over the embeddings
    table — deterministic by construction (int64-quantized vectors ⇒
    exact associative partial sums; no RNG: init = k lowest-id
    vectors), so the result is bit-stable across cluster sizes and
    block layouts even though the algorithm is iterative and hence not
    SQL-expressible. Distributed ≡ local numpy is pinned in
    ``tests/test_textops_dedup_sim.py``."""
    from jsonschema_ray.pipelines.similarity import kmeans_embeddings
    from jsonschema_ray.sources.readers import ParquetSource

    return kmeans_embeddings(ParquetSource(_pq(sf_dir, "embeddings")),
                             k=8, iters=4)


def q_pack_sequences(sf_dir: str):
    """Greedy sequence packing into 200-token context windows within
    deterministic 64-doc shards (shard = doc_id // 64) — the training
    batch-construction step; the sequential scan is O(shard) local
    work inside groupby(shard).map_groups, oracled by a recursive CTE
    replaying the same first-fit recurrence."""
    from jsonschema_ray.pipelines.textops import pack_sequences
    from jsonschema_ray.sources.readers import ParquetSource

    return pack_sequences(ParquetSource(_pq(sf_dir, "documents")),
                          key_col="doc_id", cap=200, shard_size=64)


def q_rebalance_sources(sf_dir: str):
    """Corpus-mix rebalancing: every language downsampled to the
    smallest language's size (en is 3.4x fr in the testdata) by a
    deterministic hash rate derived from a small per-stratum count
    groupby (the two-pass curation feedback loop); the sample itself
    is a zero-shuffle per-batch filter."""
    from jsonschema_ray.pipelines.sampling import rebalance_sources
    from jsonschema_ray.sources.readers import ParquetSource

    return rebalance_sources(ParquetSource(_pq(sf_dir, "documents")),
                             key_col="doc_id", strata_col="lang",
                             columns=["doc_id", "lang"])


def q_incremental_dedup(sf_dir: str):
    """Incremental cross-corpus near-dup (continuous ingestion): the
    even-doc_id half of ``documents`` is persisted as a MinHash-LSH
    index (bucket-partitioned band rows + shingle blobs under /tmp,
    rebuilt per run) and the odd half is queried against it — the
    indexed half's TEXT is never read on the query path; verification
    runs on the stored blobs. md5 token hash end to end, so the full
    chain (banding, candidate join, distinct-shingle Jaccard) is
    bit-exact in SQL (``_incremental_dedup_sql``)."""
    import os
    import shutil

    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.dedup import (minhash_index_write,
                                                minhash_query_index)
    from jsonschema_ray.raycompat import read_parquet_clean
    from jsonschema_ray.sources.readers import DatasetSource

    tag = os.path.basename(os.path.normpath(sf_dir))
    index_dir = f"/tmp/jsr_mh_index_{tag}"
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)

    def half(parity: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            keep = pc.equal(pc.bit_wise_and(ids, 1), parity)
            return t.filter(keep)
        return read_parquet_clean(_pq(sf_dir, "documents"),
                                  columns=["doc_id", "text"]) \
            .map_batches(f, batch_format="pyarrow")

    minhash_index_write(DatasetSource(half(0)), "doc_id", index_dir,
                        token_hash=md5_hash64)
    out = minhash_query_index(DatasetSource(half(1)), "doc_id",
                              index_dir, threshold=0.5,
                              token_hash=md5_hash64)
    return out.sort(["key_new", "key_idx"])


def q_temperature_mix(sf_dir: str):
    """Temperature-flattened source mixing (T5/LLaMA α-sampling,
    unnormalized per-stratum form, α=0.5): keep-rate per source is
    min(1, 2/√n_s) via the bit-exact md5 rule — sqrt is correctly
    rounded on both engines, so no cross-engine float hazard; see
    sampling.temperature_mix."""
    from jsonschema_ray.pipelines.sampling import temperature_mix
    from jsonschema_ray.sources.readers import ParquetSource

    return temperature_mix(ParquetSource(_pq(sf_dir, "documents")),
                           key_col="doc_id", strata_col="source",
                           alpha=0.5, scale=2.0,
                           columns=["doc_id", "source"])


def q_psi_drift(sf_dir: str):
    """Distribution-drift check #2 (north-star family): PSI between
    the even/odd event_id cohorts of events.value over 10 equal-width
    bins — two streaming aggregate passes, ≤10 partial rows per block
    shuffled, integer-quantized contributions for an exact hash."""
    from jsonschema_ray.pipelines.stats import psi_drift
    from jsonschema_ray.sources.readers import ParquetSource

    return psi_drift(ParquetSource(_pq(sf_dir, "events")),
                     value_col="value", key_col="event_id")


def q_ks_drift(sf_dir: str):
    """Distribution-drift check #3: EXACT two-sample KS statistic in
    integer arithmetic (ECDF gaps as cross-multiplied counts) — the
    sort ships collapsed (value, nb, nc) rows only, each sorted block
    reduces to 5 scalars, the driver combines O(#blocks)."""
    from jsonschema_ray.pipelines.stats import ks_drift
    from jsonschema_ray.sources.readers import ParquetSource

    return ks_drift(ParquetSource(_pq(sf_dir, "events")),
                    value_col="value", key_col="event_id")


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 tf-idf terms: distributed document-frequency
    groupby (per-block deduplicated (doc,token) partials) → broadcast
    idf table → vectorized per-batch tf + top-k. Integer-quantized
    scores make the driver hash exact vs DuckDB (same libm log)."""
    from jsonschema_ray.pipelines.textops import tfidf_top_terms
    from jsonschema_ray.sources.readers import ParquetSource

    return tfidf_top_terms(ParquetSource(_pq(sf_dir, "documents")),
                           key_col="doc_id", k=3)


_HLL_COLS = (  # (table, column, exercises)
    ("documents", "text", "linear-counting branch"),
    ("events", "event_id", "linear-counting near the 2.5m cut"),
    ("lineitem", "l_orderkey", "raw harmonic-mean branch"),
)


def q_hll_registers(sf_dir: str):
    """Cross-engine HLL certificate: the full sketch pipeline (per-block
    partials → tree merge, ``pipelines.stats.profile`` with the
    ``md5`` hash == DuckDB ``md5_number_lower``) emits its register-value
    HISTOGRAM — pure integers, bit-reproducible in SQL (register index =
    top-12 hash bits, rho = 53 - bitlength of the low-52 remainder) —
    plus the rounded distinct estimate, covering both estimator branches
    across three columns. This upgrades the 'approximate, so rows-only'
    HLL story to a SQL-oracled one: the ESTIMATE is approximate, the
    SKETCH STATE is exact."""
    import pandas as pd

    from jsonschema_ray.functions.sketches import HyperLogLog
    from jsonschema_ray.pipelines.stats import ProfileSpec, profile
    from jsonschema_ray.sources.readers import ParquetSource

    rows = []
    for table, col, _why in _HLL_COLS:
        p = profile(ParquetSource(_pq(sf_dir, table)),
                    [ProfileSpec(column=col, hll=True, hash_fn="md5")])[col]
        hll = HyperLogLog.deserialize(bytes.fromhex(p["hll"]))
        est = int(round(hll.estimate()))
        hist = np.bincount(hll.registers)
        rows += [{"column": f"{table}.{col}", "rho": int(r),
                  "n_registers": int(n), "distinct_est": est}
                 for r, n in enumerate(hist) if n]
    return pd.DataFrame(rows)


def _hll_sql() -> str:
    """Generate the register-exact HLL oracle for ``q_hll_registers``:
    same md5 hash, same (idx, rho) split, same linear-counting /
    harmonic-mean estimate as ``functions.sketches.HyperLogLog``."""
    arms = []
    for table, col, _why in _HLL_COLS:
        arms.append(f"""
SELECT * FROM (
WITH hv AS (SELECT md5_number_lower(CAST({col} AS VARCHAR)) AS h
            FROM {table} WHERE {col} IS NOT NULL),
r AS (SELECT CAST(h >> 52 AS INTEGER) AS idx,
             53 - length(ltrim(bin(h & ((CAST(1 AS UBIGINT) << 52) - 1)),
                               '0')) AS rho
      FROM hv),
regs AS (SELECT idx, MAX(rho) AS rho FROM r GROUP BY idx),
hist AS (SELECT rho, count(*) AS n FROM regs GROUP BY rho
         UNION ALL
         SELECT 0 AS rho, 4096 - (SELECT count(*) FROM regs) AS n),
est AS (SELECT CASE WHEN e <= 2.5 * 4096.0 AND z > 0
                    THEN 4096.0 * ln(4096.0 / z) ELSE e END AS v
        FROM (SELECT (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
                     / SUM(n * power(2.0, -rho)) AS e,
                     COALESCE(SUM(CASE WHEN rho = 0 THEN n END), 0) AS z
              FROM hist))
SELECT '{table}.{col}' AS "column", CAST(rho AS BIGINT) AS rho,
       CAST(n AS BIGINT) AS n_registers,
       CAST(ROUND((SELECT v FROM est), 0) AS BIGINT) AS distinct_est
FROM hist WHERE n > 0)""")
    return "\nUNION ALL\n".join(arms)


def q_cosine_pairs_exact(sf_dir: str):
    """EXACT all-pairs embedding cosine near-dup join (cos >= 0.45) —
    distributed block-nested-loop against a broadcast normalized matrix.
    SQL-oracled (DuckDB ``list_cosine_similarity`` over DOUBLE[] casts);
    0.45 sits mid-gap in the sf corpus' similarity distribution, so
    cross-engine float64 summation order can't flip a pair."""
    from jsonschema_ray.pipelines.similarity import cosine_pairs_exact
    from jsonschema_ray.sources.readers import ParquetSource

    return cosine_pairs_exact(ParquetSource(_pq(sf_dir, "embeddings")),
                              threshold=0.45)


def q_ngram_jaccard(sf_dir: str):
    """EXACT all-pairs word-3-shingle Jaccard >= 0.4 via the distributed
    inverted shingle index (no LSH prefilter, no false negatives) —
    reports the intersection size too, so the oracle checks the whole
    count chain, not just the final ratio. Complements minhash_verified
    (threshold 0.5, LSH-prefiltered): together they pin down both the
    exact join and the LSH recall."""
    from jsonschema_ray.pipelines.dedup import ngram_jaccard_pairs
    from jsonschema_ray.sources.readers import ParquetSource

    return ngram_jaccard_pairs(ParquetSource(_pq(sf_dir, "documents")),
                               "doc_id", threshold=0.4)


def q_cms_registers(sf_dir: str):
    """Count-min sketch register certificate: the full fixed-memory
    frequency-sketch pipeline (per-block nonzero cells → one small
    ``groupby(cell).sum`` — the shuffle carries registers, never
    tokens) with the md5 token hash, so every register re-derives
    bit-exactly in DuckDB.  Same approximate-sketch/exact-state split
    as ``hll_registers``."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.textops import cms_token_registers
    from jsonschema_ray.sources.readers import ParquetSource

    return cms_token_registers(ParquetSource(_pq(sf_dir, "documents")),
                               token_hash=md5_hash64)


def q_cms_topk(sf_dir: str):
    """Heavy-hitter estimation THROUGH the count-min sketch: true top-20
    token counts (exact thin-shuffle top-k) side by side with their CMS
    point estimates (min over rows) — the oracle re-derives both, which
    pins the estimate ≥ truth guarantee cross-engine.  Driver holds the
    bounded register table (≤ depth·width rows) + 20 tokens."""
    import pandas as pd

    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.textops import (cms_estimate,
                                                  cms_token_registers,
                                                  token_topk)
    from jsonschema_ray.sources.readers import ParquetSource

    src = ParquetSource(_pq(sf_dir, "documents"))
    regs = cms_token_registers(src, token_hash=md5_hash64).to_pandas()
    top = token_topk(src, k=20).to_pandas()
    est = cms_estimate(regs, top["token"].to_numpy(),
                       token_hash=md5_hash64)
    return pd.DataFrame({"token": top["token"],
                         "n_true": top["n"].astype("int64"),
                         "n_est": est.astype("int64")})


def q_token_topk(sf_dir: str):
    """Exact top-20 token frequencies (thin (token, n) partial shuffle,
    never the text; deterministic n-desc/token-asc tie-break). The
    Misra-Gries mergeable-summary scale path of the same operator is
    pytest-certified (``test_token_topk_*``)."""
    from jsonschema_ray.pipelines.textops import token_topk
    from jsonschema_ray.sources.readers import ParquetSource

    return token_topk(ParquetSource(_pq(sf_dir, "documents")), k=20)


def q_redact_text(sf_dir: str):
    """PII/noise scrubbing: email/URL/IPv4 literals → placeholder
    tokens via vectorized RE2 replace — and DuckDB executes the SAME
    RE2 patterns, so the scrubbed text is SQL-oracled byte-exactly."""
    from jsonschema_ray.pipelines.textops import redact_text
    from jsonschema_ray.sources.readers import ParquetSource

    return redact_text(ParquetSource(_pq(sf_dir, "documents")), "doc_id")


def q_stratified_sample(sf_dir: str):
    """Language-balanced deterministic resample: per-lang keep rates
    (en 0.5, fr 1.0, others 0.25) by md5 bucket of doc_id — the
    corpus-balancing op, reproducible by construction and SQL-oracled
    bit-exactly."""
    from jsonschema_ray.pipelines.sampling import stratified_hash_sample
    from jsonschema_ray.sources.readers import ParquetSource

    return stratified_hash_sample(
        ParquetSource(_pq(sf_dir, "documents")), "doc_id", "lang",
        rates={"en": 0.5, "fr": 1.0}, default_rate=0.25)


def q_chunk_documents(sf_dir: str):
    """Context chunking: split documents into 32-token windows
    (disjoint; RAG/embedding preprocessing). Fully vectorized — one
    flat fancy-index gather + ListArray binary_join per batch.
    SQL-oracled exactly (token subscripts → floor-div grouping →
    ordered string_agg)."""
    from jsonschema_ray.pipelines.textops import chunk_documents
    from jsonschema_ray.sources.readers import ParquetSource

    return chunk_documents(ParquetSource(_pq(sf_dir, "documents")),
                           "doc_id", chunk_tokens=32)


def q_split_assign(sf_dir: str):
    """Deterministic train/val/test split (80/10/10 by md5 bucket of
    doc_id) — reproducible across runs/cluster sizes by construction,
    and SQL-oracled bit-exactly via ``md5_number_lower``."""
    from jsonschema_ray.pipelines.sampling import hash_split
    from jsonschema_ray.sources.readers import ParquetSource

    return hash_split(ParquetSource(_pq(sf_dir, "documents")), "doc_id")


def q_winnow_fingerprints(sf_dir: str):
    """MOSS winnowing fingerprints (window 4 over word-3-shingles),
    SQL-oracled bit-exactly: md5 token hash + the same FNV rolling
    combine as the minhash oracle, window-min via SQL window function,
    leftmost tie-break via MIN(pos) join-back. Guarantees any shared
    6-token run yields a shared fingerprint."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.textops import winnow_fingerprints
    from jsonschema_ray.sources.readers import ParquetSource

    return winnow_fingerprints(ParquetSource(_pq(sf_dir, "documents")),
                               "doc_id", token_hash=md5_hash64)


def _winnow_sql(window: int = 4) -> str:
    """Oracle for ``q_winnow_fingerprints``: shares the shingle CTE (and
    uint64 wraparound emulation) with ``_minhash_sql``."""
    F, TWO64 = 1099511628211, 1 << 64
    return rf"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r,
         md5_number_lower(tok) AS h
  FROM tp WHERE tok <> ''
), sh AS (
  SELECT t0.doc_id, t0.r - 1 AS pos,
         (((CAST(t0.h AS HUGEINT) * {F}) % {TWO64} + t1.h) % {TWO64}
          * {F} + t2.h) % {TWO64} AS s
  FROM th t0
  JOIN th t1 ON t1.doc_id = t0.doc_id AND t1.r = t0.r + 1
  JOIN th t2 ON t2.doc_id = t0.doc_id AND t2.r = t0.r + 2
), wmin AS (
  SELECT doc_id, pos AS wend,
         MIN(s) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {window - 1} PRECEDING
                      AND CURRENT ROW) AS mh
  FROM sh QUALIFY pos >= {window - 1}
), sel AS (
  SELECT w.doc_id, MIN(g.pos) AS pos, w.mh
  FROM wmin w JOIN sh g
    ON g.doc_id = w.doc_id
   AND g.pos BETWEEN w.wend - {window - 1} AND w.wend
   AND g.s = w.mh
  GROUP BY w.doc_id, w.wend, w.mh
)
SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos,
       CAST(CAST(mh AS UBIGINT) AS VARCHAR) AS fp
FROM sel
"""


def q_dup_clusters_scale(sf_dir: str):
    """Connected components through the DISTRIBUTED large-star/small-
    star path (``dup_clusters_table`` with the driver union-find
    disabled): a deterministic segmented-chain edge set derived from
    doc_ids (segments broken every 13th node) resolves to min-label
    roots. SQL-oracled against a DuckDB recursive-CTE transitive
    closure — a green row certifies the distributed label propagation
    end to end, not just pytest parity."""
    import ray.data as rd

    from jsonschema_ray.pipelines.dedup import dup_clusters_table
    from jsonschema_ray.raycompat import read_parquet_clean

    ids = read_parquet_clean(_pq(sf_dir, "documents"), columns=["doc_id"])
    max_id = int(ids.max("doc_id"))

    def edges(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ((d + 1) % 13 != 0) & (d + 1 <= max_id)
        return pa.table({"key_a": pa.array(d[keep].astype("int64")),
                         "key_b": pa.array((d[keep] + 1).astype("int64"))})

    pairs = ids.map_batches(edges, batch_format="pyarrow")
    out = dup_clusters_table(pairs, driver_max_pairs=0)
    return out.rename_columns(["key", "root"])


def q_near_dup_clusters(sf_dir: str):
    """Near-duplicate CLUSTERS: connected components over the verified
    MinHash pairs (threshold 0.5), root = min doc_id of the component
    (the canonical dedup survivor). SQL-oracled against a recursive-CTE
    transitive closure over the exact all-pairs Jaccard edge set — so a
    green row certifies pair recall AND the union-find."""
    from jsonschema_ray.pipelines.dedup import (dup_clusters_table,
                                                minhash_verified_pairs)
    from jsonschema_ray.sources.readers import ParquetSource

    pairs = minhash_verified_pairs(
        ParquetSource(_pq(sf_dir, "documents")), "doc_id", threshold=0.5)
    labels = dup_clusters_table(pairs)  # driver union-find at this size;
    # the distributed large-star/small-star path engages above
    # CLUSTERS_DRIVER_MAX_PAIRS with identical labels
    return labels.rename_columns(["doc_id", "root"])


def q_simhash(sf_dir: str):
    """64-bit simhash fingerprints, SQL-oracled: token hash is
    ``md5_hash64`` (bit-identical to DuckDB ``md5_number_lower``,
    vocab-memoized per batch), so the full bit-vote is re-derivable in
    SQL. Emitted as a decimal string (uint64 exceeds BIGINT)."""
    from jsonschema_ray.functions.sketches import md5_hash64
    from jsonschema_ray.pipelines.dedup import simhash_dataset
    from jsonschema_ray.sources.readers import ParquetSource

    ds = simhash_dataset(ParquetSource(_pq(sf_dir, "documents")), "doc_id",
                         token_hash=md5_hash64)
    return ds.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "simhash": pc.cast(t.column("simhash"), pa.string()),
        }),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    idx = t.column("vec_id").to_numpy().tolist().index(vec_id)
    return np.array(t.column("embedding")[idx].as_py(), dtype=np.float64)


def q_similarity_topk(sf_dir: str):
    """Brute-force cosine top-10 vs the vec_id=0 query vector."""
    from jsonschema_ray.pipelines.similarity import brute_force_topk
    from jsonschema_ray.sources.readers import ParquetSource

    t = brute_force_topk(ParquetSource(_pq(sf_dir, "embeddings")),
                         _query_vec(sf_dir), k=10, exclude_ids={0}, round_to=3)
    return t


def q_ann_topk(sf_dir: str):
    """LSH-bucketed approximate top-10 (scale path). SQL-oracled: the
    seeded hyperplanes are inlined into DuckDB (``_ann_sql``), so the
    probe-set pruning + within-bucket exact cosine is reproduced
    bit-for-bit — an executable spec of the approximation."""
    from jsonschema_ray.pipelines.similarity import ann_topk
    from jsonschema_ray.sources.readers import ParquetSource

    return ann_topk(ParquetSource(_pq(sf_dir, "embeddings")),
                    _query_vec(sf_dir), k=10, round_to=3)


def q_near_dup_embeddings(sf_dir: str):
    """Embedding near-dup pairs (cos ≥ 0.4) within LSH buckets.
    SQL-oracled via ``_near_dup_emb_sql`` (same inlined hyperplanes +
    same-bucket pair join + exact cosine threshold)."""
    from jsonschema_ray.pipelines.similarity import near_dup_pairs
    from jsonschema_ray.sources.readers import ParquetSource

    return near_dup_pairs(ParquetSource(_pq(sf_dir, "embeddings")),
                          threshold=0.4)


# ---------------------------------------------------------------------------
# flagship (north-rule interleaved validate, synthetic)
# ---------------------------------------------------------------------------

def q_lint_schemas_scale(sf_dir: str):
    """* rows-only: the blaze 103-rule lint registry at DATASET scale —
    an actor-pool ``map_batches`` stage (registry built once per actor)
    over a deterministic seeded corpus of schema documents, emitting
    one finding row per (schema, rule, location). Findings are
    cross-checked finding-for-finding against the single-document
    registry in ``tests/test_lintscale.py``; the registry itself is
    pinned byte-exact by the 193-fixture lint corpus replay. Sized to
    the sf via the documents row count. No SQL oracle (rule logic);
    per-rule counts keep the result small and deterministic."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from jsonschema_ray.pipelines.lintscale import (lint_schemas,
                                                    synth_schema_corpus)

    n = max(200, pq.ParquetFile(_pq(sf_dir, "documents"))
            .metadata.num_rows // 40)
    ds = rd.from_arrow(synth_schema_corpus(n)).repartition(8)
    findings = lint_schemas(ds)
    import pyarrow as _pa

    counts = findings.groupby("rule_id").count()
    out = counts.sort("rule_id").to_pandas()
    out = out.rename(columns={"count()": "findings"})
    return out


def q_metaschema_scale(sf_dir: str):
    """* rows-only: the metaschema verb at DATASET scale — each schema
    document validated against its declared dialect's metaschema via
    the SimpleOutput-parity evaluator (metaschemas loaded once per
    actor), one verdict row per document. Distributed ≡ single-document
    is pinned in ``tests/test_schemaops.py``; the evaluator itself is
    pinned byte-exact by the 51-fixture metaschema corpus replay. No
    SQL oracle (evaluator logic); per-verdict counts keep the result
    small and deterministic."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from jsonschema_ray.pipelines.lintscale import synth_schema_corpus
    from jsonschema_ray.pipelines.schemaops import metaschema_check

    n = max(200, pq.ParquetFile(_pq(sf_dir, "documents"))
            .metadata.num_rows // 40)
    ds = rd.from_arrow(synth_schema_corpus(n)).repartition(8)
    out = (metaschema_check(ds).groupby("valid").count()
           .sort("valid").to_pandas())
    return out.rename(columns={"count()": "docs"})


def q_phash_near_dup(sf_dir: str):
    """* rows-only: perceptual-hash near-duplicate image pairs over a
    deterministic REAL-JPEG corpus with planted re-encodes (baseline vs
    progressive streams of the same pixels). Actor-pool decode → pHash
    (luma, area resize, 32×32 DCT) → 8-bit-chunk Hamming LSH →
    in-bucket exact verify; payload bytes never shuffle. No SQL oracle
    (binary payloads aren't a DuckDB view); re-encode invariance and
    pair exactness are pinned in ``tests/test_multimodal.py``."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from jsonschema_ray.pipelines.multimodal import (phash_near_dup,
                                                     synth_jpeg_bytes)
    from jsonschema_ray.sources.readers import DatasetSource

    n = max(64, pq.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
            // 8)
    refs, payloads = [], []
    for i in range(n):
        refs.append(f"jpg{i:06d}")
        payloads.append(synth_jpeg_bytes(seed=i))
        if i % 5 == 0:
            refs.append(f"prog{i:06d}")
            payloads.append(synth_jpeg_bytes(seed=i, progressive=True))
    t = pa.table({"media_ref": pa.array(refs),
                  "payload": pa.array(payloads, pa.binary())})
    out = phash_near_dup(DatasetSource(rd.from_arrow(t).repartition(8)))
    return out.sort(["key_a", "key_b"])


def q_audio_near_dup(sf_dir: str):
    """* rows-only: audio near-dup pairs over a deterministic
    MIXED-CODEC corpus — multi-sine WAV (Haitsma–Kalker spectral
    sub-fingerprints) with planted amplitude-rescaled re-encodes,
    plus framed MP3 streams (structural per-frame content
    fingerprints, ``functions/mp3.py``) with planted RE-TAGGED and
    padding-shifted re-muxes of identical coded audio. Actor-pool
    decode → fingerprint-value buckets → pairs sharing ≥ 8 distinct
    fingerprints; payloads never shuffle. Scale/re-mux invariance
    pinned in ``tests/test_multimodal.py`` / ``tests/test_mp3.py``."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from jsonschema_ray.functions.mp3 import build_mp3
    from jsonschema_ray.pipelines.multimodal import (audio_near_dup,
                                                     synth_rich_wav_bytes)
    from jsonschema_ray.sources.readers import DatasetSource

    n = max(32, pq.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
            // 16)
    refs, payloads = [], []
    for i in range(n):
        refs.append(f"wav{i:06d}")
        payloads.append(synth_rich_wav_bytes(seed=i))
        if i % 7 == 0:
            refs.append(f"dup{i:06d}")
            payloads.append(synth_rich_wav_bytes(seed=i, scale=0.7))
    for i in range(max(8, n // 4)):
        refs.append(f"mp3{i:06d}")
        payloads.append(build_mp3(seed=900_000 + i, n_frames=12))
        if i % 5 == 0:          # retag + shift padding: same audio
            refs.append(f"mp3dup{i:06d}")
            payloads.append(build_mp3(seed=900_000 + i, n_frames=12,
                                      id3_seed=i, pad_phase=1))
    t = pa.table({"media_ref": pa.array(refs),
                  "payload": pa.array(payloads, pa.binary())})
    out = audio_near_dup(DatasetSource(rd.from_arrow(t).repartition(8)),
                         min_shared=8)
    return out.sort(["key_a", "key_b"])


def q_video_near_dup(sf_dir: str):
    """* rows-only: video near-duplicate pairs over a deterministic
    MIXED-CODEC mp4 corpus — Motion-JPEG (REAL frame decode: sample
    tables slice real JPEG samples out of mdat, the T.81 decoder
    renders keyframes) with planted quality-re-encoded duplicates,
    plus H.264 (avc1) and H.265 (hvc1) tracks with planted RE-MUXED
    duplicates (identical coded samples, byte-different containers;
    structural NAL/IRAP fingerprints, functions/h264.py + hevc.py).
    Keyframe hash → image LSH → ≥2-frame consensus. Frame-level
    exactness pinned in ``tests/test_multimodal.py`` /
    ``tests/test_h264.py`` / ``tests/test_hevc.py``."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from jsonschema_ray.pipelines.multimodal import (synth_h264_mp4_bytes,
                                                     synth_hevc_mp4_bytes,
                                                     synth_mjpeg_mp4_bytes,
                                                     video_near_dup)
    from jsonschema_ray.sources.readers import DatasetSource

    n = max(16, pq.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
            // 32)
    refs, payloads = [], []
    for i in range(n):
        refs.append(f"vid{i:06d}")
        payloads.append(synth_mjpeg_mp4_bytes(seed=i))
        if i % 5 == 0:
            refs.append(f"dup{i:06d}")
            payloads.append(synth_mjpeg_mp4_bytes(seed=i, quality=60))
        if i % 7 == 0:
            refs.append(f"avc{i:06d}a")
            payloads.append(synth_h264_mp4_bytes(seed=i, remux_variant=0))
            refs.append(f"avc{i:06d}b")
            payloads.append(synth_h264_mp4_bytes(seed=i, remux_variant=1))
        if i % 7 == 3:
            refs.append(f"hvc{i:06d}a")
            payloads.append(synth_hevc_mp4_bytes(seed=i, remux_variant=0))
            refs.append(f"hvc{i:06d}b")
            payloads.append(synth_hevc_mp4_bytes(seed=i, remux_variant=1))
    t = pa.table({"media_ref": pa.array(refs),
                  "payload": pa.array(payloads, pa.binary())})
    out = video_near_dup(DatasetSource(rd.from_arrow(t).repartition(8)),
                         min_frames=2)
    return out.sort(["key_a", "key_b"])


def q_video_reencode_candidates(sf_dir: str):
    """* rows-only: cross-codec RE-ENCODE candidate pairs by container
    timing/geometry consensus (round-5: the honest tier for content
    re-encoded into new codec bytes, which structural fingerprints
    cannot see — pixel decode for avc1/hvc1 is explicitly out of
    scope). Corpus plants each content i as an avc1 AND an hvc1
    encoding sharing a content-driven keyframe cadence, plus decoys
    with different cadences/frame counts; planted-pair exactness is
    pinned in ``tests/test_reencode.py``."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from jsonschema_ray.pipelines.multimodal import (
        synth_h264_mp4_bytes, synth_hevc_mp4_bytes,
        video_reencode_candidates)
    from jsonschema_ray.sources.readers import DatasetSource

    n = max(16, pq.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
            // 64)
    refs, payloads = [], []
    for i in range(n):
        # content-driven scene-cut cadence, DISTINCT per content (the
        # 8-bit mask picks a unique keyframe subset for i < 251, so
        # only the planted cross-codec twins share a signature)
        m = (i % 251) + 1
        kf = (1,) + tuple(j + 2 for j in range(8) if (m >> j) & 1)
        refs.append(f"re{i:06d}a")
        payloads.append(synth_h264_mp4_bytes(seed=2 * i, kf_positions=kf))
        if i % 3 == 0:     # planted re-encode of the same content
            refs.append(f"re{i:06d}b")
            payloads.append(synth_hevc_mp4_bytes(seed=2 * i + 1,
                                                 kf_positions=kf))
    t = pa.table({"media_ref": pa.array(refs),
                  "payload": pa.array(payloads, pa.binary())})
    out = video_reencode_candidates(
        DatasetSource(rd.from_arrow(t).repartition(8)))
    return out.sort(["key_a", "key_b"])


def q_interleaved_media_decode(sf_dir: str):
    """* rows-only: the INTEGRATION pipeline the north star describes —
    interleaved docs → media spans → distinct media_ref (thin
    (ref, n_spans) shuffle; refs are catalog-bounded by construction)
    → per-ref payload fetch (deterministic object-store stand-in:
    :func:`real_media_for_refs`) → REAL decode (WAV/PNG/JPEG) → per-
    mime decode stats. Payload bytes exist only inside the decode
    stage's batches; the text/spans never meet the binary data."""
    import pyarrow.parquet as pq

    from jsonschema_ray.functions.listops import flatten_spans
    from jsonschema_ray.pipelines.multimodal import (decode_netpbm,
                                                     decode_png, decode_wav,
                                                     real_media_for_refs)
    from jsonschema_ray.sources.readers import SynthSource
    from jsonschema_ray.sources.synth import GenConfig

    n = pq.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
    src = SynthSource(GenConfig(n_docs=max(500, n)))

    def refs_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        flat, _parent, _si = flatten_spans(t, "spans")
        refs = flat.column("media_ref").drop_null()
        refs = refs.filter(pc.starts_with(refs, "media://"))
        vc = pd.Series(refs.to_numpy(zero_copy_only=False)) \
            .value_counts()
        return pa.table({"media_ref": pa.array(vc.index, pa.string()),
                         "n_spans": pa.array(vc.to_numpy(np.int64))})

    def decode_stats(t: pa.Table) -> pa.Table:
        from jsonschema_ray.functions.jpeg import decode_jpeg

        refs = t.column("media_ref").to_numpy(zero_copy_only=False)
        media = real_media_for_refs(refs)
        ok = np.zeros(len(refs), bool)
        for i, (m, p) in enumerate(zip(media.column("mime").to_pylist(),
                                       media.column("payload").to_pylist())):
            if m == "audio/wav":
                ok[i] = decode_wav(p) is not None
            elif m == "image/png":
                ok[i] = decode_png(p) is not None
            elif m == "image/jpeg":
                ok[i] = decode_jpeg(p) is not None
            else:
                ok[i] = decode_netpbm(p) is not None
        return pa.table({
            "mime": media.column("mime"),
            "n_refs": pa.array(np.ones(len(refs), np.int64)),
            "n_spans": t.column("sum(n_spans)").cast(pa.int64()),
            "n_ok": pa.array(ok.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    refs = hash_group_agg(
        src.dataset(columns=["spans"])
           .map_batches(refs_partial, batch_format="pyarrow"),
        "media_ref", {"sum(n_spans)": ("n_spans", "sum")})
    stats = refs.map_batches(decode_stats, batch_format="pyarrow",
                             batch_size=256) \
        .groupby("mime").aggregate(Sum("n_refs", alias_name="n_refs"),
                                   Sum("n_spans", alias_name="n_spans"),
                                   Sum("n_ok", alias_name="n_ok"))
    return stats.sort("mime")


def q_media_features_real(sf_dir: str):
    """* rows-only: REAL multimodal decode as actor-pool
    ``map_batches`` stages, long-format (stage, media_ref, decode_ok,
    metric) union across three pipelines — audio: PCM WAV (RIFF parse,
    rms metric); image: PPM / PNG (zlib + unfiltering) / JPEG with
    BOTH baseline and progressive T.81 streams in the corpus
    (pix_mean metric); video: mp4 box walk with REAL stts/stsz/stss
    sample tables (fps metric). No SQL oracle (payload bytes aren't a
    DuckDB view); round-trip + stdlib cross-checks live in
    ``tests/test_multimodal.py`` and ``tests/test_jpeg.py``. Only
    H.264 frame-data decode remains stubbed."""
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.multimodal import (image_features,
                                                     real_media_table,
                                                     synth_mp4_bytes,
                                                     video_meta,
                                                     wav_features)
    from jsonschema_ray.sources.readers import DatasetSource

    import ray.data as rd

    n = max(64, pq.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
            // 4)
    src = DatasetSource(rd.from_arrow(real_media_table(n)).repartition(8))

    def long_form(stage: str, metric_col: str):
        def f(t: pa.Table) -> pa.Table:
            m = t.column(metric_col).cast(pa.float64())
            return pa.table({
                "stage": pa.array([stage] * len(t), pa.string()),
                "media_ref": t.column("media_ref"),
                "decode_ok": t.column("decode_ok"),
                "metric": m,
            })
        return f

    wav = wav_features(src, concurrency=(1, 4)) \
        .map_batches(long_form("audio", "rms"), batch_format="pyarrow")
    img = image_features(src, concurrency=(1, 4)) \
        .map_batches(long_form("image", "pix_mean"),
                     batch_format="pyarrow")
    vid_tbl = pa.table({
        "media_ref": pa.array([f"media://v{i:015x}"
                               for i in range(n // 4)], pa.string()),
        "mime": pa.array(["video/mp4"] * (n // 4), pa.string()),
        "payload": pa.array([synth_mp4_bytes(7 * 100003 + i)
                             for i in range(n // 4)], pa.binary()),
    })
    vid = video_meta(DatasetSource(rd.from_arrow(vid_tbl).repartition(4)),
                     concurrency=(1, 4)) \
        .map_batches(long_form("video", "fps"), batch_format="pyarrow")
    return wav.union(img).union(vid).map_batches(
        lambda t: t.filter(t.column("decode_ok")), batch_format="pyarrow")


def q_profile_interleaved(sf_dir: str):
    """North-star sketch-profile over the INTERLEAVED table (same
    doc_id-derived spans as ``flagship_validate``): the full mergeable
    per-block-partial → tree-merge pipeline (``pipelines.stats.profile``)
    with the md5 HLL hash, per column emitting exact count / nulls, the
    register-exact HLL distinct estimate (bit-reproducible in SQL — the
    ``hll_registers`` certificate construction), and the EXACT p50 of
    ``spans.offset`` via distributed histogram selection
    (``exact_quantiles`` — no global sort). Sentinels (-1 / -1.0) mark
    fields a column doesn't track so the driver compare stays
    dtype-strict. Rows-only through r04 (t-digest p50 + fast-hash HLL
    were approximate); round 5 split the profile into its exact parts
    and certified the sketch state, making the whole row SQL-oracled.
    Sketch-profile THROUGHPUT at synthetic scale stays measured by
    bench.py's profile_stats."""
    import pandas as pd

    from jsonschema_ray.functions.sketches import HyperLogLog
    from jsonschema_ray.pipelines.stats import (ProfileSpec,
                                                exact_quantiles, profile)

    src = _DerivedInterleavedSource(_pq(sf_dir, "documents"))
    out = profile(src, [
        ProfileSpec(column="doc_id", hll=True, hash_fn="md5"),
        ProfileSpec(column="spans.kind", hll=True, hash_fn="md5"),
        ProfileSpec(column="spans.offset", hll=False),
    ])
    p50_tbl = exact_quantiles(
        _DerivedSpanOffsetsSource(_pq(sf_dir, "documents")), "off", [0.5])
    p50 = float(p50_tbl.column("value")[0].as_py())
    rows = []
    for col, p in sorted(out.items()):
        est = int(round(HyperLogLog.deserialize(
            bytes.fromhex(p["hll"])).estimate())) if p.get("hll") else -1
        rows.append({"column": col, "count": int(p["count"]),
                     "nulls": int(p["nulls"]), "distinct_est": est,
                     "p50": p50 if col == "spans.offset" else -1.0})
    return pd.DataFrame(rows)


class _DerivedSpanOffsetsSource(DocSource):
    """Flattened ``spans.offset`` (one row per span) of the derived
    interleaved table — the flat numeric stream ``exact_quantiles``
    consumes for the profile's exact p50."""

    def __init__(self, path: str):
        self.path = path

    def dataset(self, columns=None):
        from jsonschema_ray.functions.listops import flatten_spans

        def flat(t: pa.Table) -> pa.Table:
            fs, _parent, _si = flatten_spans(t, "spans")
            return pa.table({"off": fs.column("offset")})

        return _DerivedInterleavedSource(self.path).dataset() \
            .map_batches(flat, batch_format="pyarrow")


_GOOD_REF = "media://0123456789abcdef"


def _derive_key(ids: np.ndarray) -> np.ndarray:
    """Doc key with PLANTED duplicates (ids ≡ 0 mod 101 collapse onto
    three hot keys) so the flagship exercises the dataset-scope
    uniqueness shuffle with a nonzero answer. Mirrored in the oracle
    SQL's ``kdoc`` expression."""
    key = ids.astype("U20").astype(object)
    dup = ids % 101 == 0
    if dup.any():
        key[dup] = np.array(
            ["dup-%d" % m for m in (ids[dup] % 3)], dtype=object)
    return key


def _derive_interleaved_batch(t: pa.Table) -> pa.Table:
    """documents.doc_id → interleaved (doc_id: string key, spans) batch."""
    from jsonschema_ray.sources.synth import SPAN_SCHEMA

    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    n_spans, parent, s, kind, text, ref, offset = _derive_spans(ids)
    struct = pa.StructArray.from_arrays(
        [pa.array(kind, type=pa.string()),
         pa.array(text, type=pa.string(), from_pandas=True),
         pa.array(ref, type=pa.string(), from_pandas=True),
         pa.array(offset, type=pa.int32())],
        fields=list(SPAN_SCHEMA))
    offsets32 = np.concatenate(([0], np.cumsum(n_spans))).astype(np.int32)
    spans = pa.ListArray.from_arrays(
        pa.array(offsets32, type=pa.int32()), struct)
    return pa.table({"doc_id": pa.array(_derive_key(ids),
                                        type=pa.string()),
                     "spans": spans})


class _DerivedInterleavedSource(DocSource):
    """DocSource adapter: derives the interleaved table from the flat
    ``documents`` parquet in-stream (read stays pruned to doc_id)."""

    def __init__(self, path: str):
        self.path = path

    def dataset(self, columns=None):
        from jsonschema_ray.raycompat import read_parquet_clean

        ds = read_parquet_clean(self.path, columns=["doc_id"]) \
            .map_batches(_derive_interleaved_batch, batch_format="pyarrow")
        if columns:
            ds = ds.select_columns(list(columns))
        return ds


def q_span_kind_stats(sf_dir: str):
    """Interleaved-table span profile: per span KIND — span count,
    distinct-doc count, null text/media_ref tallies, offset min/max —
    over the derived interleaved table. Docs never straddle blocks, so
    per-batch distinct (kind, doc) pairs are globally distinct and the
    shuffle carries ≤ 5 stat rows per block."""
    from ray.data.aggregate import Max, Min, Sum

    from jsonschema_ray.functions.listops import flatten_spans

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        flat, parent, _si = flatten_spans(t, "spans")
        df = pd.DataFrame({
            "kind": flat.column("kind").to_numpy(zero_copy_only=False),
            "doc": parent,
            "null_text": pc.is_null(flat.column("text"))
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "null_ref": pc.is_null(flat.column("media_ref"))
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "off": flat.column("offset").to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = df.groupby("kind", sort=False).agg(
            n_spans=("doc", "size"), n_docs=("doc", "nunique"),
            null_text=("null_text", "sum"), null_ref=("null_ref", "sum"),
            off_min=("off", "min"), off_max=("off", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    src = _DerivedInterleavedSource(_pq(sf_dir, "documents"))
    agg = src.dataset().map_batches(partial, batch_format="pyarrow") \
        .groupby("kind").aggregate(
            Sum("n_spans", alias_name="n_spans"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("null_text", alias_name="null_text"),
            Sum("null_ref", alias_name="null_ref"),
            Min("off_min", alias_name="off_min"),
            Max("off_max", alias_name="off_max"))
    return agg.sort("kind")


def q_flagship_validate(sf_dir: str):
    """The north-rule flagship, SQL-oracled end to end: the FULL default
    CheckPlan (span kernels + dataset-scope uniqueness shuffle +
    broadcast-catalog referential) over the interleaved table derived
    from ``documents``. Every rule's verdict is re-stated as plain SQL
    over the flat table (see ORACLE['flagship_validate']), so the driver
    value-hash checks the whole engine path. Large-scale perf of the
    same path is measured by bench.py on the synthetic generator."""
    from jsonschema_ray.pipelines.validate import validate

    src = _DerivedInterleavedSource(_pq(sf_dir, "documents"))
    res = validate(src, catalog_keys=[_GOOD_REF])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.schema([("doc_id", pa.string()),
                              ("rule_id", pa.string()),
                              ("span_index", pa.int64()),
                              ("message", pa.string())]).empty_table()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "rule_id": t.column("rule_id"),
            "span_index": t.column("span_index").cast(pa.int64()),
            "message": t.column("message"),
        })

    return res.violations.map_batches(finish, batch_format="pyarrow")


def q_exact_quantiles(sf_dir: str):
    """Exact distributed order statistics WITHOUT a global sort:
    iterative histogram narrowing (``stats.exact_quantiles``) over
    ``orders.o_totalprice`` — ~3 streaming passes moving only thin
    (interval, bucket, count) rows, vs ``Dataset.sort``'s all-to-all
    exchange at 10^12 rows. Returns the actual element at rank
    ``max(ceil(q·n)−1, 0)``, so the values are bit-exact comparable
    with DuckDB ``quantile_disc`` (no interpolation arithmetic on
    either side)."""
    from jsonschema_ray.pipelines.stats import exact_quantiles
    from jsonschema_ray.sources.readers import ParquetSource

    return exact_quantiles(ParquetSource(_pq(sf_dir, "orders")),
                           "o_totalprice", _QUANTILE_QS)


_QUANTILE_QS = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]


def q_grouped_quantiles(sf_dir: str):
    """Per-group exact quantiles (``GROUP BY source`` +
    ``quantile_disc`` semantics) with the same histogram-narrowing
    engine — every streaming pass serves ALL (group, q) intervals at
    once, so pass count stays ~3-4 regardless of group count; no sort,
    no shuffle, driver holds only O(groups × quantiles) scalars.
    ``n_chars`` is integer (< 2^53), so float64 bucketing is exact and
    the values hash-match DuckDB after a DOUBLE cast on both sides."""
    from jsonschema_ray.pipelines.stats import exact_quantiles_by
    from jsonschema_ray.sources.readers import ParquetSource

    return exact_quantiles_by(ParquetSource(_pq(sf_dir, "documents")),
                              "source", "n_chars", _GROUPQ_QS)


_GROUPQ_QS = [0.1, 0.5, 0.9]

_WSAMPLE_CUT = (1 << 64) // 5000   # rate_per_unit = 1/5000 per n_chars unit


def q_weighted_sample(sf_dir: str):
    """Weight-proportional deterministic sample (token-budget corpus
    subsampling): keep iff ``md5(doc_id) // n_chars < 2^64/5000`` —
    inclusion probability exactly ``n_chars/5000``, pure uint64
    arithmetic (no float ``u^(1/w)`` whose libm rounding could differ
    cross-engine), zero shuffle, resharding-stable."""
    from jsonschema_ray.pipelines.sampling import weighted_hash_sample
    from jsonschema_ray.sources.readers import ParquetSource

    return weighted_hash_sample(
        ParquetSource(_pq(sf_dir, "documents")), "doc_id", "n_chars",
        rate_per_unit=1 / 5000).select_columns(["doc_id", "n_chars"])


#: Above this many HAVING-cut survivors q18 stops broadcasting the
#: okey set through the driver and attributes orders with a
#: distributed hash join instead (survivors are ~0.3% of orders, so
#: the broadcast path covers ~60M-order corpora; beyond that the
#: survivor stream itself is big data).
_Q18_BROADCAST_MAX = 200_000


def q_q18_large_orders(sf_dir: str):
    """TPC-H-Q18-style large-volume-order report: orders whose total
    quantity exceeds 300 units, with customer attribution, top-100 by
    order value. Scale shape (round-5 rework): the ORDERS side never
    shuffles. Stage 1 is the only all-to-all — per-block (orderkey,
    qty_c) combiner partials through ``hash_group_agg`` with the
    HAVING cut (~0.3% survive) applied in-bucket. Stage 2 attributes
    the survivors: below ``_Q18_BROADCAST_MAX`` survivor keys the okey
    set broadcasts via ``ray.put`` and the orders read filters
    vectorized — zero further exchange; above it the thin survivor
    stream goes through a distributed ``hash_join`` instead, with
    per-block local top-100s bounding the driver merge. Replaces the
    round-3 tag-union whose orders-side partials were
    fact-proportional — the old shape shuffled every orders row with
    three null-padded columns (15.9× time at 50× data, BASELINE.md
    round-4 table); this one ships survivors only."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    def li_partial(t: pa.Table) -> pa.Table:
        q = pa.table({"okey": t.column("l_orderkey"),
                      "qty_c": _scale100(t.column("l_quantity"))})
        return q.group_by("okey").aggregate([("qty_c", "sum")]) \
            .rename_columns(["okey", "qty_c"])

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]) \
        .map_batches(li_partial, batch_format="pyarrow")
    surv = hash_group_agg(li, "okey", {"qty_c": ("qty_c", "sum")}) \
        .map_batches(lambda t: t.filter(pc.greater(t.column("qty_c"),
                                                   30000)),
                     batch_format="pyarrow").materialize()

    ord_cols = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    n_surv = surv.count()
    if n_surv == 0:
        # typed empty: Ray's to_pandas drops empty blocks' schemas
        # (round-3 fuzz lesson), so build the frame explicitly
        top = pd.DataFrame({
            "okey": pd.Series([], dtype=np.int64),
            "qty_c": pd.Series([], dtype=np.int64),
            "ckey": pd.Series([], dtype=np.int64),
            "odate": pd.Series([], dtype="datetime64[us]"),
            "price_c": pd.Series([], dtype=np.int64)})
    elif n_surv <= _Q18_BROADCAST_MAX:
        # thin driver pull: ≤ _Q18_BROADCAST_MAX (okey, qty) rows
        sp = surv.to_pandas()
        qty_of = dict(zip(sp["okey"], sp["qty_c"]))
        keys_ref = ray.put(np.sort(sp["okey"].to_numpy()))

        def pick_orders(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            ok = t.column("o_orderkey").to_numpy()
            idx = np.searchsorted(ks, ok)
            idx[idx == len(ks)] = 0
            hit = (ks[idx] == ok) if len(ks) else np.zeros(len(ok), bool)
            return t.filter(pa.array(hit))

        om = _read(sf_dir, "orders", columns=ord_cols) \
            .map_batches(pick_orders, batch_format="pyarrow").to_pandas()
        if "o_orderkey" not in om.columns:  # all blocks filtered empty
            om = pd.DataFrame({
                "o_orderkey": pd.Series([], dtype=np.int64),
                "o_custkey": pd.Series([], dtype=np.int64),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_totalprice": pd.Series([], dtype=np.float64)})
        top = pd.DataFrame({
            "okey": om["o_orderkey"].to_numpy(),
            "qty_c": np.array([qty_of[k] for k in om["o_orderkey"]],
                              np.int64),
            "ckey": om["o_custkey"].to_numpy().astype(np.int64),
            "odate": om["o_orderdate"],
            "price_c": _scale100(pa.array(om["o_totalprice"]))
            .to_numpy()})
        top = top.sort_values(["price_c", "okey"],
                              ascending=[False, True]).head(100)
    else:
        # distributed fallback: survivors ⋈ orders on okey (both thin),
        # per-block local top-100 → ≤100-rows/block driver merge
        from jsonschema_ray.pipelines.joins import hash_join

        def ord_project(t: pa.Table) -> pa.Table:
            return pa.table({"okey": t.column("o_orderkey"),
                             "ckey": t.column("o_custkey")
                             .cast(pa.int64()),
                             "odate": t.column("o_orderdate"),
                             "price_c": _scale100(
                                 t.column("o_totalprice"))})

        orders = _read(sf_dir, "orders", columns=ord_cols) \
            .map_batches(ord_project, batch_format="pyarrow")
        j = hash_join(surv, orders, on="okey")

        def local_top(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            return pa.Table.from_pandas(
                df.sort_values(["price_c", "okey"],
                               ascending=[False, True]).head(100),
                preserve_index=False)

        batches = list(j.map_batches(local_top, batch_format="pyarrow")
                       .iter_batches(batch_format="pandas"))
        cols = ["okey", "qty_c", "ckey", "odate", "price_c"]
        allp = pd.concat(batches, ignore_index=True) if batches \
            else pd.DataFrame({c: [] for c in cols})
        top = allp.sort_values(["price_c", "okey"],
                               ascending=[False, True]).head(100)

    cust = pq.read_table(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_name"])
    ckn = cust.column("c_custkey").to_numpy()
    cname = np.empty(int(ckn.max()) + 1, dtype=object)
    cname[ckn] = cust.column("c_name").to_numpy(zero_copy_only=False)
    ck = top["ckey"].to_numpy().astype(np.int64)
    return pa.table({
        "c_name": pa.array(cname[ck], pa.string()),
        "o_custkey": pa.array(ck),
        "l_orderkey": pa.array(top["okey"].to_numpy().astype(np.int64)),
        # explicit us: an EMPTY frame's odate degrades to float64 and
        # a non-empty pandas one carries ns — both must emit the
        # oracle's timestamp[us]
        "o_orderdate": pa.array(top["odate"].to_numpy()
                                .astype("datetime64[us]"),
                                pa.timestamp("us")),
        "totalprice_c": pa.array(top["price_c"].to_numpy()
                                 .astype(np.int64)),
        "sum_qty_c": pa.array(top["qty_c"].to_numpy().astype(np.int64))})


def q_val_childless_orders(sf_dir: str):
    """REVERSE-direction referential completeness: parent rows with no
    children (orders that no lineitem references). The big side
    (lineitem at 100 TB) can never broadcast, so the shape is a thin
    tag-union anti-join: orders emit (key, 0), lineitem blocks emit
    block-distinct (key, 1), one int64-key groupby takes Max(tag), and
    parents whose max is 0 are the violations. Only 8-byte keys + a
    tag ever shuffle."""
    from ray.data.aggregate import Max

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "has_child": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    def tag_lineitem(t: pa.Table) -> pa.Table:
        col = t.column("l_orderkey")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = pc.unique(col)
        return pa.table({
            "o_orderkey": u,
            "has_child": pa.array(np.ones(len(u), np.int8)),
        })

    a = _read(sf_dir, "orders", columns=["o_orderkey"]) \
        .map_batches(tag_orders, batch_format="pyarrow")
    b = _read(sf_dir, "lineitem", columns=["l_orderkey"]) \
        .map_batches(tag_lineitem, batch_format="pyarrow")
    return hash_group_agg(a.union(b), "o_orderkey",
                          {"flag": ("has_child", "max")}) \
        .filter(expr="flag == 0").select_columns(["o_orderkey"])


def q_q10_returned_items(sf_dir: str):
    """TPC-H-Q10-style returned-item revenue report: top-20 customers
    by revenue lost to returns in 1996Q1. Scale shape: TWO all-to-alls
    (the minimum: the join key and the aggregation key differ) — (1)
    filtered thin sides tag-union into okey-hash buckets, each bucket
    joins vectorized and emits per-customer partial sums; (2) a
    distributed custkey groupby completes the sums and every output
    block emits its LOCAL top-20, so the driver merges ≤20 rows per
    block and attributes the winners from a filtered customer read.
    The 25-row nation table stays a broadcast lookup."""
    import datetime

    import pandas as pd
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from jsonschema_ray.pipelines.tpch import _nbuckets

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 4, 1)
    nb = _nbuckets()

    def li_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        ok = t.column("l_orderkey").to_numpy()
        return pa.table({
            "okey": pa.array(ok),
            "v": _scale100(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(1.0, t.column("l_discount")))),
            "side": pa.array(np.zeros(len(ok), np.int64)),
            "pb": pa.array((ok % nb).astype(np.int64))})

    lineitem = _read(sf_dir, "lineitem", columns=[
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]) \
        .map_batches(li_project, batch_format="pyarrow")

    def ord_project(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
            pc.less(t.column("o_orderdate"), pa.scalar(hi)))
        t = t.filter(keep)
        ok = t.column("o_orderkey").to_numpy()
        return pa.table({"okey": pa.array(ok),
                         "v": t.column("o_custkey").cast(pa.int64()),
                         "side": pa.array(np.ones(len(ok), np.int64)),
                         "pb": pa.array((ok % nb).astype(np.int64))})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=(pc.field("o_orderdate") >= lo)
                   & (pc.field("o_orderdate") < hi)) \
        .map_batches(ord_project, batch_format="pyarrow")

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        li = g.loc[g["side"] == 0, ["okey", "v"]] \
            .rename(columns={"v": "rev"})
        o = g.loc[g["side"] == 1, ["okey", "v"]] \
            .rename(columns={"v": "ckey"})
        j = li.merge(o, on="okey", how="inner")
        out = j.groupby("ckey", as_index=False)["rev"].sum()
        return out.astype(np.int64)

    per_cust = hash_group_agg(
        lineitem.union(orders).groupby("pb")
        .map_groups(bucket_join, batch_format="pandas"),
        "ckey", {"revenue_c": ("rev", "sum")})

    def block_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["revenue_c", "ckey"],
                           ascending=[False, True]).head(20),
            preserve_index=False)

    parts = per_cust.map_batches(block_top, batch_format="pyarrow")
    batches = list(parts.iter_batches(batch_format="pandas"))
    allp = pd.concat(batches, ignore_index=True) if batches \
        else pd.DataFrame({"ckey": [], "revenue_c": []})
    top = allp.sort_values(["revenue_c", "ckey"],
                           ascending=[False, True]).head(20)

    nation = pq.read_table(_pq(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"])
    nk = nation.column("n_nationkey").to_numpy()
    nmap = np.empty(int(nk.max()) + 1, dtype=object)
    nmap[nk] = nation.column("n_name").to_numpy(zero_copy_only=False)
    cust = pq.read_table(_pq(sf_dir, "customer"), columns=[
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    ckn = cust.column("c_custkey").to_numpy()
    cname = np.empty(int(ckn.max()) + 1, dtype=object)
    cname[ckn] = cust.column("c_name").to_numpy(zero_copy_only=False)
    cnat = np.zeros(int(ckn.max()) + 1, np.int64)
    cnat[ckn] = cust.column("c_nationkey").to_numpy()
    cbal = np.zeros(int(ckn.max()) + 1, np.int64)
    cbal[ckn] = _scale100(cust.column("c_acctbal")).to_numpy()

    ck = top["ckey"].to_numpy().astype(np.int64)
    return pa.table({
        "o_custkey": pa.array(ck),
        "c_name": pa.array(cname[ck], pa.string()),
        "n_name": pa.array(nmap[cnat[ck]], pa.string()),
        "revenue_c": pa.array(top["revenue_c"].to_numpy()
                              .astype(np.int64)),
        "acctbal_c": pa.array(cbal[ck])})


def q_stats_profile_by_source(sf_dir: str):
    """Per-GROUP column-stats profile (grouped Deequ-style completeness
    / bounds / distinct checks): one row per documents.source with doc
    count, null-text count, char bounds and distinct-lang count. Scale
    shape: one pass; each block collapses to ≤|source×lang| partial
    rows (count/nulls/min/max per pair), then two thin groupby stages
    — (source,lang) then (source) — so the shuffle carries group
    cardinality, never rows."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lang = t.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        base = pa.table({
            "source": t.column("source"),
            "lang": lang.fill_null(_NULL_KEY),  # see _NULL_KEY
            "n_chars": t.column("n_chars"),
            "is_null": pc.is_null(txt).cast(pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
        })
        g = base.group_by(["source", "lang"]).aggregate(
            [("one", "sum"), ("is_null", "sum"),
             ("n_chars", "min"), ("n_chars", "max")])
        return g.rename_columns(
            ["source", "lang", "n_docs", "null_text",
             "min_chars", "max_chars"])

    pairs = _read(sf_dir, "documents",
                  columns=["source", "lang", "n_chars", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "lang"]).aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("null_text", alias_name="null_text"),
            Min("min_chars", alias_name="min_chars"),
            Max("max_chars", alias_name="max_chars"))

    def lang_flag(t: pa.Table) -> pa.Table:
        lang = t.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        return t.append_column(
            "has_lang",
            pc.invert(pc.equal(lang, _NULL_KEY)).cast(pa.int64()))

    return pairs.map_batches(lang_flag, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("null_text", alias_name="null_text"),
            Min("min_chars", alias_name="min_chars"),
            Max("max_chars", alias_name="max_chars"),
            Sum("has_lang", alias_name="n_lang"))


def q_inverted_index(sf_dir: str):
    """Inverted-index statistics build over documents: token →
    document frequency + 5 smallest posting ids (see
    textops.inverted_index for the bucketed-merge scale shape)."""
    from jsonschema_ray.pipelines.textops import inverted_index
    from jsonschema_ray.sources.readers import ParquetSource

    return inverted_index(ParquetSource(_pq(sf_dir, "documents")),
                          sample_k=5).select_columns(
        ["token", "df", "top_docs"])


def q_hll_by_group(sf_dir: str):
    """GROUPED register-exact HLL: distinct user_id per event_type.
    Extends the ``hll_registers`` certificate to grouped sketches —
    the per-group estimate is approximate, the per-group register
    STATE is exact, so it SQL-oracles. Scale shape: per block, values
    hash (md5, DuckDB-replicable) to (group, register idx, rho) rows
    collapsed block-locally; the shuffle then carries at most
    |groups|×4096 thin rows into a Max aggregate; the driver only ever
    holds the merged registers (|groups|×4096 bytes)."""
    import pandas as pd

    from ray.data.aggregate import Max

    from jsonschema_ray.functions.sketches import HyperLogLog, md5_hash64

    P = HyperLogLog.P
    M = HyperLogLog.M
    LOW = np.uint64((1 << (64 - P)) - 1)

    def partial(t: pa.Table) -> pa.Table:
        grp = t.column("event_type")
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        uid = t.column("user_id")
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        mask = pc.invert(pc.is_null(uid))
        gv = grp.filter(mask).to_numpy(zero_copy_only=False)
        uv = uid.filter(mask).to_numpy(zero_copy_only=False)
        if not len(uv):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "idx": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = md5_hash64(uv)
        idx = (h >> np.uint64(64 - P)).astype(np.int64)
        w = (h & LOW).astype(np.float64)
        # exact bit length of the low-(64-P) remainder: ints < 2^52
        # are exactly representable in float64, so frexp's exponent IS
        # the bit length; rho = (64-P) - bitlen + 1
        _, exp = np.frexp(w)
        rho = (64 - P) - exp + 1
        d = pd.DataFrame({"event_type": gv, "idx": idx, "rho": rho})
        m = d.groupby(["event_type", "idx"], sort=False)["rho"].max()
        mi = m.index.to_frame(index=False)
        return pa.table({"event_type": pa.array(mi["event_type"], pa.string()),
                         "idx": pa.array(mi["idx"].to_numpy(), pa.int64()),
                         "rho": pa.array(m.to_numpy().astype(np.int64))})

    regs = _read(sf_dir, "events", columns=["event_type", "user_id"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "idx"]) \
        .aggregate(Max("rho", alias_name="rho")) \
        .take_all()  # ≤ |groups|×4096 thin rows by construction

    by_grp: dict[str, np.ndarray] = {}
    for r in regs:
        arr = by_grp.setdefault(r["event_type"], np.zeros(M, np.uint8))
        arr[int(r["idx"])] = np.uint8(r["rho"])
    rows = []
    for g in sorted(by_grp):
        hll = HyperLogLog(by_grp[g])
        est = int(round(hll.estimate()))
        hist = np.bincount(hll.registers)
        rows += [{"event_type": g, "rho": int(rr), "n_registers": int(n),
                  "distinct_est": est}
                 for rr, n in enumerate(hist) if n]
    return pd.DataFrame(rows)


def q_shard_manifest(sf_dir: str):
    """Deterministic shuffle-shard training-output writer: documents
    hash into 8 shards (md5-mod, no global sort), each shard written
    atomically as one (h, doc_id)-ordered parquet with a _SUCCESS
    fingerprint marker; the returned manifest (shard, n_docs,
    n_tokens, fp_xor) is the writer's own output dataset and is
    SQL-exact (bit_xor over md5_number_lower content hashes). Resume
    semantics (committed shards not rewritten) pinned in
    ``tests/test_shardwriter.py``."""
    import shutil
    import tempfile

    from jsonschema_ray.pipelines.shardwriter import shuffle_shard_write
    from jsonschema_ray.sources.readers import ParquetSource

    out = tempfile.mkdtemp(prefix="shard_manifest_")
    try:
        m = shuffle_shard_write(ParquetSource(_pq(sf_dir, "documents")),
                                out, n_shards=8, seed=7)
        return m.sort("shard").to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_nb_quality_scores(sf_dir: str):
    """Model-based quality classification: multinomial Naive Bayes
    trained by one counting shuffle (thin (token, c0, c1) partials —
    the text never shuffles), weak labels n_chars >= 200, scored by a
    broadcast integer micro-nat LLR table in a second streaming pass.
    Bit-exact vs the SQL oracle (one floor(1e6·Δln + 0.5) per token,
    identical libm expression both sides)."""
    from jsonschema_ray.pipelines.classify import nb_quality_scores
    from jsonschema_ray.sources.readers import ParquetSource

    return nb_quality_scores(
        ParquetSource(_pq(sf_dir, "documents"))).sort("doc_id")


def q_bpe_word_histogram(sf_dir: str):
    """Full word-frequency histogram over documents — the data-scale
    pass of BPE training (one thin (word, n) row per distinct word per
    block; the text never shuffles). Deterministic n-desc/word-asc
    order; same whitespace/null contract as ``token_topk``."""
    from jsonschema_ray.pipelines.tokenizer import word_histogram
    from jsonschema_ray.sources.readers import ParquetSource

    hist = word_histogram(ParquetSource(_pq(sf_dir, "documents")))
    return hist.sort(["n", "word"], descending=[True, False])


def q_bpe_train_merges(sf_dir: str):
    """* rows-only (iterative argmax loop — not SQL-expressible): BPE
    merge table (rank, left, right, pair_count) trained on documents.
    Distributed corpus→histogram pass + deterministic driver merge
    loop on the capped histogram (the HF-tokenizers shape); pinned
    against an independent quadratic reference implementation in
    ``tests/test_tokenizer.py``."""
    from jsonschema_ray.pipelines.tokenizer import bpe_train_table
    from jsonschema_ray.sources.readers import ParquetSource

    return bpe_train_table(ParquetSource(_pq(sf_dir, "documents")),
                           num_merges=200, max_words=100_000)


def q_bpe_token_counts(sf_dir: str):
    """* rows-only: per-document BPE token counts under a tokenizer
    trained on the same corpus (train → broadcast merges once via
    ``ray.put`` → actor-pool encode with per-batch distinct-word
    dedup). Encoder exactness and the token-conservation invariant
    are pinned in ``tests/test_tokenizer.py``."""
    from jsonschema_ray.pipelines.tokenizer import (bpe_encode,
                                                    bpe_train_table)
    from jsonschema_ray.sources.readers import ParquetSource

    src = ParquetSource(_pq(sf_dir, "documents"))
    merges = bpe_train_table(src, num_merges=200, max_words=100_000)
    return bpe_encode(src, merges).sort("doc_id")


# ---------------------------------------------------------------------------
# catalogs
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[str], Any]] = {
    "exact_quantiles": q_exact_quantiles,
    "grouped_quantiles": q_grouped_quantiles,
    "weighted_sample": q_weighted_sample,
    "val_lang_enum": q_val_lang_enum,
    "val_nchars_range": q_val_nchars_range,
    "val_unique_user": q_val_unique_user,
    "val_ref_orders": q_val_ref_orders,
    "val_ref_orders_bloom": q_val_ref_orders_bloom,
    "val_ref_orders_join": q_val_ref_orders_join,
    "val_spans_documents": q_val_spans_documents,
    "val_props_payload": q_val_props_payload,
    "val_schema_events": q_val_schema_events,
    "val_schema_documents": q_val_schema_documents,
    "stats_profile_documents": q_stats_profile_documents,
    "q1_pricing_summary": q_q1_pricing_summary,
    "q3_top_orders": q_q3_top_orders,
    "q5_local_supplier_volume": q_q5_local_supplier_volume,
    "events_running_window": q_events_running_window,
    "string_funcs_documents": q_string_funcs_documents,
    "sort_topk_orders": q_sort_topk_orders,
    "distinct_mktsegment": q_distinct_mktsegment,
    "events_hourly": q_events_hourly,
    "events_hopping": q_events_hopping,
    "events_sessionize": q_events_sessionize,
    "events_debounce": q_events_debounce,
    "events_top_per_user": q_events_top_per_user,
    "asof_clicks": q_asof_clicks,
    "interval_windows": q_interval_windows,
    "token_count": q_token_count,
    "repetition_signals": q_repetition_signals,
    "unigram_lm": q_unigram_lm,
    "quality_counts": q_quality_counts,
    "gopher_rules": q_gopher_rules,
    "repetition_suite": q_repetition_suite,
    "langid": q_langid,
    "dedup_exact_summary": q_dedup_exact_summary,
    "decontaminate": q_decontaminate,
    "bloom_decontaminate": q_bloom_decontaminate,
    "dsir_scores": q_dsir_scores,
    "dsir_select": q_dsir_select,
    "bpe_token_count": q_bpe_token_count,
    "normalize_text": q_normalize_text,
    "boilerplate_ngrams": q_boilerplate_ngrams,
    "repeated_substrings": q_repeated_substrings,
    "substring_scrub": q_substring_scrub,
    "embedding_quantize": q_embedding_quantize,
    "dedup_survivors_e2e": q_dedup_survivors_e2e,
    "domain_cap": q_domain_cap,
    "dedup_prefix_groups": q_dedup_prefix_groups,
    "minhash_pairs": q_minhash_pairs,
    "minhash_verified": q_minhash_verified,
    "ngram_jaccard": q_ngram_jaccard,
    "near_dup_clusters": q_near_dup_clusters,
    "dup_clusters_scale": q_dup_clusters_scale,
    "minhash_verified_joined": q_minhash_verified_joined,
    "unigram_lm_topk": q_unigram_lm_topk,
    "tfidf_top_terms": q_tfidf_top_terms,
    "psi_drift": q_psi_drift,
    "ks_drift": q_ks_drift,
    "rebalance_sources": q_rebalance_sources,
    "temperature_mix": q_temperature_mix,
    "incremental_dedup": q_incremental_dedup,
    "pack_sequences": q_pack_sequences,
    "kmeans_embeddings": q_kmeans_embeddings,
    "semdedup": q_semdedup,
    "quality_filter": q_quality_filter,
    "embedding_decontaminate": q_embedding_decontaminate,
    "zscore_outliers": q_zscore_outliers,
    "cosine_pairs_exact": q_cosine_pairs_exact,
    "hll_registers": q_hll_registers,
    "winnow_fingerprints": q_winnow_fingerprints,
    "split_assign": q_split_assign,
    "token_topk": q_token_topk,
    "shard_manifest": q_shard_manifest,
    "nb_quality_scores": q_nb_quality_scores,
    "bpe_word_histogram": q_bpe_word_histogram,
    "bpe_train_merges": q_bpe_train_merges,
    "bpe_token_counts": q_bpe_token_counts,
    "cms_registers": q_cms_registers,
    "cms_topk": q_cms_topk,
    "chunk_documents": q_chunk_documents,
    "redact_text": q_redact_text,
    "stratified_sample": q_stratified_sample,
    "simhash": q_simhash,
    "similarity_topk": q_similarity_topk,
    "ann_topk": q_ann_topk,
    "near_dup_embeddings": q_near_dup_embeddings,
    "profile_interleaved": q_profile_interleaved,
    "media_features_real": q_media_features_real,
    "phash_near_dup": q_phash_near_dup,
    "audio_near_dup": q_audio_near_dup,
    "video_near_dup": q_video_near_dup,
    "video_reencode_candidates": q_video_reencode_candidates,
    "interleaved_media_decode": q_interleaved_media_decode,
    "lint_schemas_scale": q_lint_schemas_scale,
    "metaschema_scale": q_metaschema_scale,
    "flagship_validate": q_flagship_validate,
    "span_kind_stats": q_span_kind_stats,
    "q18_large_orders": q_q18_large_orders,
    "stats_profile_by_source": q_stats_profile_by_source,
    "inverted_index": q_inverted_index,
    "hll_by_group": q_hll_by_group,
    "events_funnel": q_events_funnel,
    "latest_per_key": q_latest_per_key,
    "events_retention": q_events_retention,
    "rollup_source_lang": q_rollup_source_lang,
    "q10_returned_items": q_q10_returned_items,
    "val_childless_orders": q_val_childless_orders,
}

MINHASH_VERIFIED_SQL = r"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), sh AS (
  SELECT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
           AS shingle
  FROM (SELECT * FROM tp WHERE tok <> '')
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL
), sets AS (
  SELECT DISTINCT doc_id, shingle FROM sh
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b, count(*) AS i
  FROM sets a JOIN sets b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT key_a, key_b,
       ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = key_a
JOIN sizes sb ON sb.doc_id = key_b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
"""

ORACLE: dict[str, str] = {
    "exact_quantiles":
        f"SELECT CAST(q AS DOUBLE) AS q, value FROM ("
        f"SELECT unnest({_QUANTILE_QS!r}) AS q, "
        f"unnest(quantile_disc(o_totalprice, {_QUANTILE_QS!r})) AS value "
        f"FROM orders) ORDER BY q",
    "grouped_quantiles":
        f"SELECT source, CAST(q AS DOUBLE) AS q, "
        f"CAST(value AS DOUBLE) AS value FROM ("
        f"SELECT source, unnest({_GROUPQ_QS!r}) AS q, "
        f"unnest(quantile_disc(n_chars, {_GROUPQ_QS!r})) AS value "
        f"FROM documents GROUP BY source) ORDER BY source, q",
    "weighted_sample":
        "SELECT doc_id, n_chars FROM documents "
        "WHERE n_chars > 0 AND "
        "(md5_number_lower(CAST(doc_id AS VARCHAR)) "
        f"// CAST(n_chars AS UBIGINT)) < CAST({_WSAMPLE_CUT} AS UBIGINT)",
    # null lang IS an enum violation (JSON semantics: null is not a
    # member of ["en","fr","es"]) — the engine kernel and this SQL agree
    "val_lang_enum":
        "SELECT doc_id, lang FROM documents "
        f"WHERE lang IS NULL "
        f"OR lang NOT IN ({', '.join(repr(x) for x in _ALLOWED_LANGS)})",
    "val_nchars_range":
        "SELECT doc_id, n_chars FROM documents "
        "WHERE n_chars < 50 OR n_chars > 500",
    "val_unique_user":
        "SELECT user_id, count(*) AS total FROM events "
        "GROUP BY user_id HAVING count(*) > 1",
    "val_ref_orders":
        "SELECT o_orderkey, o_custkey FROM orders "
        "WHERE o_custkey NOT IN "
        "(SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0)",
    "val_ref_orders_bloom": VAL_REF_ORDERS_BLOOM_SQL,
    "val_ref_orders_join":
        "SELECT CAST(o_orderkey AS VARCHAR) AS doc_id, "
        "'ref_custkey' AS rule_id, CAST(-1 AS INTEGER) AS span_index, "
        "'o_custkey missing from customer catalog' AS message "
        "FROM orders WHERE o_custkey NOT IN "
        "(SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0)",
    "val_spans_documents": _SPANS_SQL,
    "val_props_payload":
        "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k "
        "FROM events WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NULL "
        "OR CAST(json_extract(props, '$.k') AS BIGINT) >= 80",
    # the nested-payload schema (meta.type enum / meta.k max / vals
    # items min) re-stated on the RAW columns — independent of all JSON
    # machinery on the engine side
    "val_schema_events":
        "SELECT event_id FROM events "
        "WHERE event_type NOT IN ('click', 'view', 'signup', 'purchase') "
        "OR CAST(json_extract(props, '$.k') AS BIGINT) > 79 "
        "OR user_id < 1",
    # each rule schema_to_plan generates from _DOCS_SCHEMA, re-stated as
    # plain SQL (type assertions are statically true for these columns)
    "val_schema_documents":
        "SELECT doc_id, 'lang.schema' AS rule_id FROM documents "
        "WHERE lang IS NOT NULL AND lang NOT IN ('en', 'fr', 'es') "
        "UNION ALL SELECT doc_id, 'n_chars.schema' FROM documents "
        "WHERE n_chars IS NOT NULL AND NOT (n_chars BETWEEN 50 AND 500) "
        "UNION ALL SELECT doc_id, 'source.schema' FROM documents "
        "WHERE source IS NOT NULL AND NOT "
        "(regexp_matches(source, '^src') AND length(source) <= 4) "
        "UNION ALL SELECT doc_id, 'text.schema' FROM documents "
        "WHERE text IS NOT NULL AND NOT (length(text) >= 1) "
        "UNION ALL SELECT doc_id, 'doc_id.schema' FROM documents "
        "WHERE doc_id IS NOT NULL AND NOT (doc_id >= 0)",
    "stats_profile_documents":
        "SELECT count(*) AS n_docs, count(DISTINCT lang) AS n_lang, "
        "CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS null_text, "
        "CAST(min(n_chars) AS BIGINT) AS min_chars, "
        "CAST(max(n_chars) AS BIGINT) AS max_chars FROM documents",
    # money/qty aggregated as exact scaled integers (floor(x*100+0.5)):
    # identical per-row doubles on both engines ⇒ identical ints ⇒
    # order-independent sums (distributed double-sums are not).
    "q1_pricing_summary":
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_c, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_c, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*(1+l_tax)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_c, "
        "CAST(SUM(CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_discount_c, "
        "count(*) AS count_order, "
        "CAST(FLOOR(CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE) "
        "/ count(*) + 0.5) AS BIGINT) AS avg_qty_c "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus",
    "events_hourly":
        "SELECT event_type, date_trunc('hour', ts) AS hour, "
        "count(*) AS n, "
        "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS sum_value_c "
        "FROM events GROUP BY event_type, date_trunc('hour', ts)",
    # hopping window: each event in the 4 windows [b-45m..b], b = 15-min
    # bucket of ts — mirrored by the engine's np.tile hop replication
    "events_hopping":
        "SELECT event_type, "
        "time_bucket(INTERVAL '15 minutes', ts) "
        "  - i * INTERVAL '15 minutes' AS wstart, "
        "count(*) AS n, "
        "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS sum_value_c "
        "FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) "
        "GROUP BY 1, 2",
    "q3_top_orders":
        "SELECT l_orderkey, "
        "CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) "
        "AS BIGINT)) AS BIGINT) AS revenue_c, count(*) AS n_items "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY l_orderkey "
        "ORDER BY revenue_c DESC, l_orderkey LIMIT 10",
    "q5_local_supplier_volume":
        "SELECT n_name, CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)"
        "*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c "
        "FROM customer, orders, lineitem, supplier, nation, region "
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
        "AND r_name = 'ASIA' "
        "AND o_orderdate >= TIMESTAMP '1995-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name",
    "events_running_window":
        "SELECT event_id, user_id, "
        "CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_value_c, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS BIGINT) AS row_n FROM events",
    "string_funcs_documents":
        "SELECT doc_id, upper(substr(text, 1, 12)) AS head_upper, "
        "replace(lang, 'en', 'EN') AS lang_up, "
        "CAST(length(source) AS BIGINT) AS src_len, "
        "lang || '-' || source AS tag FROM documents",
    "sort_topk_orders":
        "SELECT o_orderkey, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) "
        "AS totalprice_c FROM orders "
        "ORDER BY totalprice_c DESC, o_orderkey LIMIT 20",
    "distinct_mktsegment":
        "SELECT DISTINCT c_mktsegment AS mktsegment FROM customer",
    "events_top_per_user":
        "SELECT user_id, event_id, "
        "CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY value DESC, event_id) AS rn FROM events) WHERE rn = 1",
    "events_sessionize":
        "WITH e AS (SELECT user_id, ts, "
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
        "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
        "> INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns FROM events) "
        "SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions, "
        "count(*) AS n_events "
        "FROM e GROUP BY user_id",
    "events_debounce": """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS pts
  FROM events)
WHERE pts IS NULL OR ts - pts >= INTERVAL 60 SECOND
""",
    "token_count":
        r"SELECT doc_id, len(regexp_extract_all(COALESCE(text, ''),"
        r" '\S+')) AS n_tokens "
        "FROM documents",
    "quality_counts":
        r"SELECT doc_id, length(t) AS n_chars, "
        r"len(regexp_extract_all(t, '\S+')) AS n_tokens, "
        r"len(regexp_extract_all(t, '[.!?,;:]')) AS n_punct, "
        r"len(regexp_extract_all(t, '\b(the|and|of|to|in|is|a)\b')) AS n_stop "
        "FROM (SELECT doc_id, COALESCE(text, '') AS t FROM documents)",
    # the Gopher rule set: same RE2 patterns, integer cross-multiplied
    # ratio tests, one regexp_matches per stopword for DISTINCT presence
    "gopher_rules": r"""
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '\S+')) AS BIGINT) AS n_words,
         CAST(length(t) - len(regexp_extract_all(t, '\s')) AS BIGINT)
           AS word_chars,
         CAST(len(regexp_extract_all(t, '[^\s]*[A-Za-z][^\s]*')) AS BIGINT)
           AS n_alpha_words,
         CAST(len(regexp_extract_all(t, '#'))
              + len(regexp_extract_all(t, '\.\.\.|…')) AS BIGINT)
           AS n_symbols,
         CAST((CASE WHEN regexp_matches(t, '\bthe\b') THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(t, '\bbe\b') THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(t, '\bto\b') THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(t, '\bof\b') THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(t, '\band\b') THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(t, '\bthat\b') THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(t, '\bhave\b') THEN 1 ELSE 0 END)
            + (CASE WHEN regexp_matches(t, '\bwith\b') THEN 1 ELSE 0 END)
           AS BIGINT) AS n_stop_distinct
  FROM (SELECT doc_id, COALESCE(text, '') AS t FROM documents)
)
SELECT doc_id, n_words, word_chars, n_alpha_words, n_symbols,
       n_stop_distinct,
       (n_words >= 50 AND n_words <= 100000) AS flag_word_count,
       (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
         AS flag_mean_word_len,
       (10 * n_symbols <= n_words) AS flag_symbol_ratio,
       (5 * n_alpha_words >= 4 * n_words) AS flag_alpha_words,
       (n_stop_distinct >= 2) AS flag_stopwords,
       (n_words >= 50 AND n_words <= 100000
        AND 3 * n_words <= word_chars AND word_chars <= 10 * n_words
        AND 10 * n_symbols <= n_words
        AND 5 * n_alpha_words >= 4 * n_words
        AND n_stop_distinct >= 2) AS passes
FROM c
""",
    # word-2-gram repetition signals: ordered tokens re-derived via
    # row_number, grams via the r+1 self-join, integer char totals —
    # same tie-break (count DESC, gram ASC) as the engine kernel
    "repetition_signals": r"""
WITH tok AS (
  SELECT doc_id, i, t FROM (
    SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS t
    FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS l
          FROM documents))
  WHERE t <> ''
), seq AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r, t
  FROM tok
), gram AS (
  SELECT a.doc_id, a.t || ' ' || b.t AS g
  FROM seq a JOIN seq b ON b.doc_id = a.doc_id AND b.r = a.r + 1
), gc AS (
  SELECT doc_id, g, count(*) AS n FROM gram GROUP BY doc_id, g
), top AS (
  SELECT doc_id, g, n FROM (
    SELECT doc_id, g, n,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n DESC, g) AS rk
    FROM gc) WHERE rk = 1
), dup AS (
  SELECT doc_id, SUM(n * length(g)) AS dup_chars
  FROM gc WHERE n >= 2 GROUP BY doc_id
), ntok AS (
  SELECT d.doc_id,
         CAST(len(regexp_extract_all(COALESCE(d.text, ''), '\S+'))
              AS BIGINT) AS n_tokens
  FROM documents d
)
SELECT ntok.doc_id, ntok.n_tokens, top.g AS top_2gram,
       CAST(COALESCE(top.n, 0) AS BIGINT) AS top_2gram_count,
       CAST(COALESCE(top.n * length(top.g), 0) AS BIGINT) AS top_2gram_chars,
       CAST(COALESCE(dup.dup_chars, 0) AS BIGINT) AS dup_2gram_chars
FROM ntok
LEFT JOIN top ON top.doc_id = ntok.doc_id
LEFT JOIN dup ON dup.doc_id = ntok.doc_id
""",
    # unigram-LM surprisal: same corpus-trained counts, same quantized
    # per-token score floor(1e6*ln(N/c)+0.5) (DuckDB ln == libm log ==
    # the engine's math.log), integer sums are order-independent
    "unigram_lm": r"""
WITH tok AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS t
    FROM documents)
  WHERE t <> ''
), vocab AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), tot AS (
  SELECT count(*) AS n FROM tok
), scored AS (
  SELECT tok.doc_id,
         CAST(floor(1e6 * ln(CAST(tot.n AS DOUBLE) / vocab.c) + 0.5)
              AS BIGINT) AS q
  FROM tok JOIN vocab USING (t) CROSS JOIN tot
)
SELECT d.doc_id,
       CAST(len(regexp_extract_all(COALESCE(d.text, ''), '\S+'))
            AS BIGINT) AS n_tokens,
       CAST(COALESCE(s.lm, 0) AS BIGINT) AS lm_score
FROM documents d
LEFT JOIN (SELECT doc_id, SUM(q) AS lm FROM scored GROUP BY doc_id) s
  ON s.doc_id = d.doc_id
""",
    "dedup_exact_summary":
        "SELECT count(*) AS n_rows, "
        "count(DISTINCT COALESCE(text, '')) AS n_unique, "
        "(SELECT count(*) FROM (SELECT COALESCE(text, '') FROM documents "
        " GROUP BY 1 HAVING count(*) > 1)) AS n_dup_groups "
        "FROM documents",
    "dedup_prefix_groups":
        "SELECT substr(COALESCE(text, ''), 1, 20) AS prefix, "
        "count(*) AS n_copies, "
        "min(doc_id) AS keep_id FROM documents "
        "GROUP BY 1 HAVING count(*) > 1",
    "hll_registers": _hll_sql(),
    "winnow_fingerprints": _winnow_sql(),
    "token_topk": r"""
SELECT tok AS token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_split_to_array(COALESCE(text, ''), '\s+'))
        AS tok FROM documents)
WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok LIMIT 20
""",
    "shard_manifest": r"""
WITH h AS (
  SELECT CAST((md5_number_lower('s7|' || CAST(doc_id AS VARCHAR)) >> 1)
              % 8 AS BIGINT) AS shard,
         CAST(md5_number_lower(COALESCE(text,'')) >> 1 AS BIGINT) AS ch,
         CAST(len(regexp_extract_all(COALESCE(text,''), '\S+'))
              AS BIGINT) AS nt
  FROM documents)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(bit_xor(ch) AS BIGINT) AS fp_xor
FROM h GROUP BY shard ORDER BY shard
""",
    "nb_quality_scores": r"""
WITH lab AS (
  SELECT doc_id, COALESCE(text,'') AS text,
         CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS y
  FROM documents
), tok AS (
  SELECT doc_id, y, t FROM (
    SELECT doc_id, y, unnest(regexp_split_to_array(text, '\s+')) AS t
    FROM lab) WHERE t <> ''
), counts AS (
  SELECT t, SUM(1 - y) AS c0, SUM(y) AS c1 FROM tok GROUP BY t
), tot AS (
  SELECT CAST(SUM(c0) AS BIGINT) AS t0, CAST(SUM(c1) AS BIGINT) AS t1,
         CAST(COUNT(*) AS BIGINT) AS v FROM counts
), pri AS (
  SELECT CAST(floor(1e6 * (ln(CAST(SUM(y) + 1 AS DOUBLE))
                           - ln(CAST(COUNT(*) - SUM(y) + 1 AS DOUBLE)))
              + 0.5) AS BIGINT) AS pq FROM lab
), q AS (
  SELECT t, CAST(floor(1e6 * (
      ln(CAST(c1 + 1 AS DOUBLE) / CAST(t1 + v AS DOUBLE))
    - ln(CAST(c0 + 1 AS DOUBLE) / CAST(t0 + v AS DOUBLE))) + 0.5)
    AS BIGINT) AS qv
  FROM counts, tot
), per_doc AS (
  SELECT tok.doc_id, SUM(q.qv) AS s
  FROM tok JOIN q ON tok.t = q.t GROUP BY tok.doc_id
)
SELECT lab.doc_id,
       CAST(len(regexp_extract_all(lab.text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(pri.pq + COALESCE(per_doc.s, 0) AS BIGINT) AS nb_llr,
       CAST(CASE WHEN pri.pq + COALESCE(per_doc.s, 0) > 0
            THEN 1 ELSE 0 END AS INTEGER) AS predicted
FROM lab CROSS JOIN pri LEFT JOIN per_doc ON lab.doc_id = per_doc.doc_id
ORDER BY lab.doc_id
""",
    "bpe_word_histogram": r"""
SELECT tok AS word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_split_to_array(COALESCE(text, ''), '\s+'))
        AS tok FROM documents)
WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok
""",
    # count-min registers: same md5 token hash, same multiply-SHIFT row
    # hash (high 10 bits of the mod-2^64 product; splitmix64/xxhash64
    # mixing primes). uint64 wraparound emulated WITHOUT INT128 overflow
    # by a 32-bit split multiply: h·a mod 2^64 =
    # ((hi·a mod 2^32)·2^32 + lo·a) mod 2^64, every term < 2^97.
    "cms_registers": r"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(COALESCE(text, ''), '\s+')) AS t
  FROM documents
), th AS (
  SELECT CAST(md5_number_lower(t) AS HUGEINT) AS h FROM tok WHERE t <> ''
), k(r, a, b) AS (
  VALUES (0, CAST(11400714819323198485 AS HUGEINT), CAST(1 AS HUGEINT)),
         (1, CAST(14029467366897019727 AS HUGEINT), CAST(3 AS HUGEINT)),
         (2, CAST(1609587929392839161 AS HUGEINT), CAST(5 AS HUGEINT)),
         (3, CAST(2870177450012600261 AS HUGEINT), CAST(7 AS HUGEINT))
)
SELECT CAST(k.r AS BIGINT) AS r,
       CAST(((((h // 4294967296) * k.a) % 4294967296) * 4294967296
             + (h % 4294967296) * k.a + k.b)
            % 18446744073709551616 // 18014398509481984 AS BIGINT) AS c,
       CAST(count(*) AS BIGINT) AS cnt
FROM th CROSS JOIN k
GROUP BY 1, 2
""",
    # heavy hitters THROUGH the sketch: exact top-20 + CMS min-over-rows
    # point estimates from the same register state
    "cms_topk": r"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(COALESCE(text, ''), '\s+')) AS t
  FROM documents
), th AS (
  SELECT t, CAST(md5_number_lower(t) AS HUGEINT) AS h
  FROM tok WHERE t <> ''
), k(r, a, b) AS (
  VALUES (0, CAST(11400714819323198485 AS HUGEINT), CAST(1 AS HUGEINT)),
         (1, CAST(14029467366897019727 AS HUGEINT), CAST(3 AS HUGEINT)),
         (2, CAST(1609587929392839161 AS HUGEINT), CAST(5 AS HUGEINT)),
         (3, CAST(2870177450012600261 AS HUGEINT), CAST(7 AS HUGEINT))
), regs AS (
  SELECT k.r AS r,
         CAST(((((h // 4294967296) * k.a) % 4294967296) * 4294967296
               + (h % 4294967296) * k.a + k.b)
              % 18446744073709551616 // 18014398509481984 AS BIGINT) AS c,
         count(*) AS cnt
  FROM th CROSS JOIN k GROUP BY 1, 2
), top AS (
  SELECT t AS token, CAST(md5_number_lower(t) AS HUGEINT) AS h,
         CAST(count(*) AS BIGINT) AS n_true
  FROM th GROUP BY t ORDER BY n_true DESC, token LIMIT 20
)
SELECT top.token, top.n_true, CAST(MIN(regs.cnt) AS BIGINT) AS n_est
FROM top CROSS JOIN k
JOIN regs ON regs.r = k.r
         AND regs.c = CAST(((((top.h // 4294967296) * k.a) % 4294967296)
                            * 4294967296
                            + (top.h % 4294967296) * k.a + k.b)
                           % 18446744073709551616
                           // 18014398509481984 AS BIGINT)
GROUP BY 1, 2
""",
    # counts are taken on the PROGRESSIVELY scrubbed text (email on the
    # original, url after email redaction, ip after url redaction) —
    # mirroring redact_text's sequential passes; DuckDB and Arrow both
    # run RE2, so the patterns behave identically
    "redact_text": r"""
WITH s0 AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
s1 AS (SELECT doc_id,
              regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                             '<EMAIL>', 'g') AS t,
              len(regexp_extract_all(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1
       FROM s0),
s2 AS (SELECT doc_id, regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g') AS t,
              c1, len(regexp_extract_all(t, 'https?://[^\s]+')) AS c2
       FROM s1),
s3 AS (SELECT doc_id,
              regexp_replace(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g')
                AS t,
              c1, c2,
              len(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS c3
       FROM s2)
SELECT doc_id, t AS text, CAST(c1 + c2 + c3 AS BIGINT) AS n_redacted
FROM s3
""",
    "stratified_sample":
        "SELECT doc_id, lang FROM documents "
        "WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000000 < "
        "CASE WHEN lang = 'en' THEN 500000 "
        "     WHEN lang = 'fr' THEN 1000000 ELSE 250000 END",
    "chunk_documents": r"""
WITH toks AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS r,
         tok
  FROM (SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
        FROM (SELECT doc_id,
                     regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
              FROM documents))
  WHERE tok <> ''
)
SELECT doc_id, CAST(r // 32 AS BIGINT) AS chunk_idx,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(tok, ' ' ORDER BY r) AS chunk
FROM toks GROUP BY doc_id, r // 32
""",
    "split_assign": """
SELECT doc_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id,
             CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 100
                  AS BIGINT) AS bucket
      FROM documents)
""",
    "cosine_pairs_exact":
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])) >= 0.45",
    "similarity_topk":
        "SELECT e.vec_id, ROUND(CAST(list_cosine_similarity(e.embedding, "
        "(SELECT embedding FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 3) AS cos_sim "
        "FROM embeddings e WHERE e.vec_id <> 0 "
        "ORDER BY cos_sim DESC, e.vec_id LIMIT 10",
    "asof_clicks":
        "SELECT p.event_id, p.user_id, p.ts, "
        "c.event_id AS click_id, c.ts AS click_ts "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts",
    "interval_windows": """
WITH topp AS (
  SELECT event_id, ts FROM events WHERE event_type = 'purchase'
  ORDER BY value DESC, event_id LIMIT 20
), w AS (
  SELECT event_id AS window_id,
         ts - INTERVAL 10 MINUTE AS ws,
         ts + INTERVAL 10 MINUTE AS we
  FROM topp
)
SELECT w.window_id, count(*) AS n_events,
       CAST(SUM(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM w JOIN events e ON e.ts BETWEEN w.ws AND w.we
GROUP BY 1
""",
    "langid": _langid_sql(),
    "minhash_pairs": _minhash_sql(),
    "decontaminate": _decontam_sql(),
    "bloom_decontaminate": _bloom_decontam_sql(),
    "repetition_suite": _repetition_suite_sql(),
    "dsir_scores": _dsir_sql(),
    "dsir_select": _dsir_sql() + "ORDER BY score_q DESC, d.doc_id LIMIT 100",
    "bpe_token_count": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '\S+')) AS BIGINT)
         AS n_ws_tokens,
       CAST(len(regexp_extract_all(COALESCE(text, ''),
            '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
         AS BIGINT) AS n_bpe_pretokens
FROM documents
""",
    "normalize_text": r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))),
                           '\s+', ' ', 'g')) AS norm_text,
       trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))),
                           '\s+', ' ', 'g')) <> COALESCE(text, '')
         AS changed,
       CAST(length(trim(regexp_replace(lower(nfc_normalize(
            COALESCE(text, ''))), '\s+', ' ', 'g'))) AS BIGINT)
         AS n_chars_norm
FROM documents
""",
    "boilerplate_ngrams": _boilerplate_sql(),
    "repeated_substrings": _repeated_substr_sql(),
    "substring_scrub": _substring_scrub_sql(),
    "domain_cap": r"""
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= 15
""",
    "embedding_quantize": r"""
WITH e AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), rng AS (
  SELECT dim, CAST(min(x) AS DOUBLE) AS lo, CAST(max(x) AS DOUBLE) AS hi
  FROM e GROUP BY dim
)
SELECT e.vec_id,
       CAST(e.dim AS BIGINT) AS dim,
       CAST(CASE WHEN rng.hi = rng.lo THEN 0
            ELSE floor((e.x - rng.lo) * (254.0 / (rng.hi - rng.lo))
                       + 0.5) - 127 END AS BIGINT) AS code
FROM e JOIN rng USING (dim)
""",
    "ann_topk": _ann_sql(),
    "near_dup_embeddings": _near_dup_emb_sql(),
    # simhash re-derived bit-by-bit in SQL: the engine's token hash is
    # md5_hash64 == DuckDB md5_number_lower (verified bit-identical), so
    # the per-bit ±1 vote and the strict acc>0 threshold reproduce the
    # exact 64-bit fingerprint. Zero-token docs fingerprint to 0.
    "simhash": r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(COALESCE(text, ''), '\s+')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, md5_number_lower(tok) AS h FROM toks WHERE tok <> ''
), votes AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS b)
  GROUP BY doc_id, b
), fp AS (
  SELECT doc_id,
         bit_or(CASE WHEN s > 0 THEN CAST(1 AS UBIGINT) << CAST(b AS INTEGER)
                     ELSE CAST(0 AS UBIGINT) END) AS sh
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(fp.sh, 0) AS VARCHAR) AS simhash
FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
""",
    # ALL pairs with exact word-3-shingle Jaccard >= 0.5, shingle-joined
    # (docs with <3 tokens have empty shingle sets and can never pair).
    # This is a strictly STRONGER claim than the engine makes: the
    # engine reports LSH candidates that verify, the oracle reports
    # every true near-dup pair — matching it certifies LSH recall = 1.0
    # on this corpus, not just verification correctness.
    "minhash_verified": MINHASH_VERIFIED_SQL,
    # Connected components over the exact all-pairs Jaccard>=0.5 edges
    # via recursive-CTE transitive closure; root = min reachable key.
    # Oracles pair recall AND the engine's union-find clustering.
    "minhash_verified_joined": MINHASH_VERIFIED_SQL,
    # full near-dup dedup: exact pair edges -> recursive closure ->
    # drop non-root members; certifies LSH recall + clustering +
    # survivor filtering in one row
    "dedup_survivors_e2e": (
        "WITH RECURSIVE pairs AS (" + MINHASH_VERIFIED_SQL + "),\n"
        "n(key) AS (SELECT key_a FROM pairs UNION SELECT key_b FROM pairs),\n"
        "reach(key, node) AS (\n"
        "  SELECT key, key FROM n\n"
        "  UNION\n"
        "  SELECT r.key, CASE WHEN p.key_a = r.node THEN p.key_b"
        " ELSE p.key_a END\n"
        "  FROM reach r JOIN pairs p ON p.key_a = r.node"
        " OR p.key_b = r.node\n"
        "),\n"
        "losers AS (\n"
        "  SELECT key FROM (SELECT key, MIN(node) AS root FROM reach"
        " GROUP BY key) WHERE root != key\n"
        ")\n"
        "SELECT d.doc_id, d.n_chars FROM documents d\n"
        "WHERE d.doc_id NOT IN (SELECT key FROM losers)"
    ),
    "embedding_decontaminate": r"""
WITH b AS (
  SELECT vec_id, embedding FROM embeddings WHERE label = 0
), c AS (
  SELECT vec_id, embedding FROM embeddings WHERE label <> 0
), s AS (
  SELECT c.vec_id, b.vec_id AS bench_id,
         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cs
  FROM c CROSS JOIN b
), r AS (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cs DESC, bench_id ASC) AS rn
  FROM s)
SELECT vec_id, bench_id, ROUND(cs, 4) AS cos_sim
FROM r WHERE rn = 1 AND cs >= 0.4
""",
    "quality_filter": r"""
WITH q AS (
  SELECT quantile_disc(n_chars, 0.1) AS lo,
         quantile_disc(n_chars, 0.9) AS hi
  FROM documents)
SELECT doc_id, n_chars FROM documents, q
WHERE n_chars >= q.lo AND n_chars <= q.hi
""",
    "zscore_outliers": r"""
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(100.0 * value + 0.5) AS BIGINT) AS vc
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), mom AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(vc) AS BIGINT) AS s,
         CAST(SUM(vc * vc) AS BIGINT) AS ss
  FROM v GROUP BY event_type
), st AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / n AS mean,
         CAST(ss AS DOUBLE) / n
           - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) AS var
  FROM mom)
SELECT v.event_id, v.event_type, v.vc AS value_c,
       CAST(floor(1e4 * ((v.vc - st.mean) / sqrt(st.var)) + 0.5)
            AS BIGINT) AS z_q
FROM v JOIN st ON st.event_type = v.event_type
WHERE ABS((v.vc - st.mean) / sqrt(st.var)) > 2.0
""",
    "pack_sequences": r"""
WITH RECURSIVE d AS (
  SELECT doc_id, doc_id // 64 AS shard,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
           AS n_tokens,
         row_number() OVER (PARTITION BY doc_id // 64
                            ORDER BY doc_id) AS rn
  FROM documents
), packed AS (
  SELECT doc_id, shard, n_tokens, rn,
         CAST(0 AS BIGINT) AS pack, n_tokens AS acc
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.doc_id, d.shard, d.n_tokens, d.rn,
         CASE WHEN p.acc + d.n_tokens <= 200
              THEN p.pack ELSE p.pack + 1 END,
         CASE WHEN p.acc + d.n_tokens <= 200
              THEN p.acc + d.n_tokens ELSE d.n_tokens END
  FROM d JOIN packed p ON d.shard = p.shard AND d.rn = p.rn + 1)
SELECT doc_id, shard, pack, n_tokens FROM packed
""",
    "rebalance_sources": r"""
WITH cnt AS (
  SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang
), mn AS (SELECT MIN(c) AS m FROM cnt),
rate AS (
  SELECT lang,
         CAST(floor(1000000 * (CAST(mn.m AS DOUBLE) / c)) AS BIGINT)
         AS ppm
  FROM cnt CROSS JOIN mn)
SELECT d.doc_id, d.lang, r.ppm AS rate_ppm
FROM documents d JOIN rate r ON r.lang IS NOT DISTINCT FROM d.lang
WHERE CAST(md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 1000000
           AS BIGINT) < r.ppm
""",
    "incremental_dedup": _incremental_dedup_sql(),
    # α=0.5 temperature mix: sqrt is IEEE-correctly-rounded on both
    # engines, LEAST/min agree, and the keep rule is a pure integer
    # compare on the top 32 hash bits — bit-exact end to end.
    "temperature_mix": r"""
WITH cnt AS (
  SELECT COALESCE(source, '￿__null__') AS s, COUNT(*) AS c
  FROM documents GROUP BY 1
), rate AS (
  SELECT s, CAST(FLOOR(LEAST(1.0, 2.0 / sqrt(CAST(c AS DOUBLE)))
                       * 4294967296.0) AS BIGINT) AS cut
  FROM cnt)
SELECT d.doc_id, d.source, r.cut AS rate_q32
FROM documents d
JOIN rate r ON COALESCE(d.source, '￿__null__') = r.s
WHERE CAST(md5_number_lower(CAST(d.doc_id AS VARCHAR)) >> 32 AS BIGINT)
      < r.cut
""",
    "psi_drift": r"""
WITH src AS (
  SELECT event_id, value FROM events WHERE value IS NOT NULL
), mm AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM src),
assigned AS (
  SELECT CASE WHEN mm.hi > mm.lo
              THEN LEAST(9, GREATEST(0, CAST(floor(
                   (value - mm.lo) / (mm.hi - mm.lo) * 10.0) AS BIGINT)))
              ELSE 0 END AS bin,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS isb
  FROM src CROSS JOIN mm
), g AS (
  SELECT r.range AS bin,
         CAST(COALESCE(SUM(a.isb), 0) AS BIGINT) AS base_n,
         CAST(COALESCE(SUM(1 - a.isb), 0) AS BIGINT) AS cur_n
  FROM range(0, 10) r LEFT JOIN assigned a ON a.bin = r.range
  GROUP BY r.range
), tot AS (
  SELECT CAST(SUM(base_n) AS DOUBLE) AS tb,
         CAST(SUM(cur_n) AS DOUBLE) AS tc FROM g)
SELECT bin, base_n, cur_n,
       CAST(floor(1e6 * (
         ((cur_n + 0.5) / (tot.tc + 5.0) - (base_n + 0.5) / (tot.tb + 5.0))
         * ln(((cur_n + 0.5) / (tot.tc + 5.0))
              / ((base_n + 0.5) / (tot.tb + 5.0)))) + 0.5) AS BIGINT)
       AS psi_q
FROM g CROSS JOIN tot
""",
    "ks_drift": r"""
WITH u AS (
  SELECT value AS v,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS b
  FROM events WHERE value IS NOT NULL
), tot AS (
  SELECT CAST(SUM(b) AS BIGINT) AS nb,
         CAST(COUNT(*) - SUM(b) AS BIGINT) AS nc FROM u
), g AS (
  SELECT v, CAST(SUM(b) AS BIGINT) AS gb,
         CAST(COUNT(*) - SUM(b) AS BIGINT) AS gc
  FROM u GROUP BY v
), c AS (
  SELECT SUM(gb) OVER (ORDER BY v) AS cb,
         SUM(gc) OVER (ORDER BY v) AS cc FROM g
), m AS (
  SELECT CAST(MAX(ABS(cb * (SELECT nc FROM tot)
                      - cc * (SELECT nb FROM tot))) AS BIGINT) AS ks_num
  FROM c)
SELECT (SELECT nb FROM tot) AS nb, (SELECT nc FROM tot) AS nc, ks_num,
       CAST(floor(1e6 * (CAST(ks_num AS DOUBLE)
            / (CAST((SELECT nb FROM tot) AS BIGINT)
               * (SELECT nc FROM tot))) + 0.5) AS BIGINT) AS ks_q
FROM m
""",
    "tfidf_top_terms": r"""
WITH tok AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS t
    FROM documents)
  WHERE t <> ''
), tf AS (
  SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t
), df AS (
  SELECT t, count(DISTINCT doc_id) AS df FROM tok GROUP BY t
), n AS (SELECT count(*) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.t AS token, tf.tf, df.df,
         CAST(floor(1e6 * (tf.tf * ln((n.n + 1.0) / (df.df + 1.0)))
                    + 0.5) AS BIGINT) AS tfidf_q
  FROM tf JOIN df ON df.t = tf.t CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf_q DESC, token ASC) AS rnk
  FROM scored)
SELECT doc_id, token, tf, df, tfidf_q, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
""",
    "unigram_lm_topk": r"""
WITH tok AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS t
    FROM documents)
  WHERE t <> ''
), vocab AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), tot AS (
  SELECT count(*) AS n FROM tok
), keep AS (
  SELECT t, c FROM vocab ORDER BY c DESC, t ASC LIMIT 5
), scored AS (
  SELECT tok.doc_id,
         CAST(floor(1e6 * ln(CAST(tot.n AS DOUBLE) / COALESCE(k.c, 1))
                    + 0.5) AS BIGINT) AS q
  FROM tok LEFT JOIN keep k ON k.t = tok.t CROSS JOIN tot
)
SELECT d.doc_id,
       CAST(len(regexp_extract_all(COALESCE(d.text, ''), '\S+'))
            AS BIGINT) AS n_tokens,
       CAST(COALESCE(s.lm, 0) AS BIGINT) AS lm_score
FROM documents d
LEFT JOIN (SELECT doc_id, SUM(q) AS lm FROM scored GROUP BY doc_id) s
  ON s.doc_id = d.doc_id
""",
    "dup_clusters_scale": r"""
WITH RECURSIVE e AS (
  SELECT doc_id AS a, doc_id + 1 AS b
  FROM documents
  WHERE (doc_id + 1) % 13 != 0
    AND doc_id + 1 <= (SELECT MAX(doc_id) FROM documents)
),
n(key) AS (SELECT a FROM e UNION SELECT b FROM e),
reach(key, node) AS (
  SELECT key, key FROM n
  UNION
  SELECT r.key, CASE WHEN e.a = r.node THEN e.b ELSE e.a END
  FROM reach r JOIN e ON e.a = r.node OR e.b = r.node
)
SELECT key, MIN(node) AS root FROM reach GROUP BY key ORDER BY key
""",
    "near_dup_clusters": r"""
WITH RECURSIVE tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), sh AS (
  SELECT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
           AS shingle
  FROM (SELECT * FROM tp WHERE tok <> '')
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL
), sets AS (
  SELECT DISTINCT doc_id, shingle FROM sh
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b, count(*) AS i
  FROM sets a JOIN sets b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), dup_pairs AS (
  SELECT key_a, key_b FROM inter
  JOIN sizes sa ON sa.doc_id = key_a
  JOIN sizes sb ON sb.doc_id = key_b
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
), edges AS (
  SELECT key_a AS a, key_b AS b FROM dup_pairs
  UNION
  SELECT key_b, key_a FROM dup_pairs
), reach AS (
  SELECT a AS k, a AS r FROM edges
  UNION
  SELECT e.b AS k, reach.r FROM reach JOIN edges e ON e.a = reach.k
)
SELECT k AS doc_id, CAST(MIN(r) AS BIGINT) AS root
FROM reach GROUP BY k
""",
    # Same exact all-pairs shingle join, threshold 0.4, with the
    # intersection size exposed — oracles the engine's inverted-index
    # count chain (ngram_jaccard_pairs), not just the final ratio.
    "ngram_jaccard": r"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), sh AS (
  SELECT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
           AS shingle
  FROM (SELECT * FROM tp WHERE tok <> '')
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL
), sets AS (
  SELECT DISTINCT doc_id, shingle FROM sh
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b, count(*) AS i
  FROM sets a JOIN sets b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT key_a, key_b, CAST(i AS BIGINT) AS n_common,
       ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = key_a
JOIN sizes sb ON sb.doc_id = key_b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.4
""",
    # The full default CheckPlan re-stated rule by rule over the flat
    # documents table: span-kernel arms share the derived-span CTE with
    # val_spans_documents, plus the uniqueness group-by and the
    # referential arm (catalog = {_GOOD_REF}, so bad refs are exactly
    # the planted (did+si)%13 spans).
    "span_kind_stats": """
WITH spans AS (
  SELECT d.doc_id AS did, s AS si,
         (d.doc_id*7 + s*3) % 5 AS k,
         list_extract(['text','image','audio','table','video'],
                      CAST((d.doc_id*7 + s*3) % 5 AS INTEGER) + 1)
           AS kind,
         CASE WHEN (d.doc_id*7 + s*3) % 5 = 0
                   AND (d.doc_id + s) % 11 = 0 THEN NULL
              WHEN (d.doc_id*7 + s*3) % 5 = 0 THEN 'tok'
              ELSE NULL END AS txt,
         CASE WHEN (d.doc_id*7 + s*3) % 5 = 0 THEN NULL
              WHEN (d.doc_id + s) % 13 = 0 THEN 'http://bad'
              ELSE 'media://0123456789abcdef' END AS ref,
         CASE WHEN (d.doc_id % 23)=0 AND s=0 THEN -1
              WHEN (d.doc_id % 17)=0 AND s=1 THEN 0
              ELSE s*5 END AS off
  FROM documents d
  JOIN (SELECT unnest(generate_series(0, 2)) AS s) g
    ON g.s <= (d.doc_id % 3)
)
SELECT kind,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(DISTINCT did) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE txt IS NULL) AS BIGINT) AS null_text,
       CAST(COUNT(*) FILTER (WHERE ref IS NULL) AS BIGINT) AS null_ref,
       CAST(MIN(off) AS BIGINT) AS off_min,
       CAST(MAX(off) AS BIGINT) AS off_max
FROM spans GROUP BY kind ORDER BY kind
""",
    "flagship_validate": """
WITH spans AS (
  SELECT d.doc_id AS did,
         CASE WHEN d.doc_id % 101 = 0
              THEN 'dup-' || CAST(d.doc_id % 3 AS VARCHAR)
              ELSE CAST(d.doc_id AS VARCHAR) END AS kdoc,
         s AS si,
         (d.doc_id*7 + s*3) % 5 AS k,
         CASE WHEN (d.doc_id % 23)=0 AND s=0 THEN -1
              WHEN (d.doc_id % 17)=0 AND s=1 THEN 0
              ELSE s*5 END AS off,
         CASE WHEN s=0 THEN NULL
              WHEN (d.doc_id % 23)=0 AND s-1=0 THEN -1
              WHEN (d.doc_id % 17)=0 AND s-1=1 THEN 0
              ELSE (s-1)*5 END AS prev_off
  FROM documents d
  JOIN (SELECT unnest(generate_series(0, 2)) AS s) g
    ON g.s <= (d.doc_id % 3)
)
SELECT kdoc AS doc_id, 'kind_enum' AS rule_id,
       CAST(si AS BIGINT) AS span_index,
       'span kind must be one of text/image/audio/table' AS message
  FROM spans WHERE k = 4
UNION ALL
SELECT kdoc, 'text_requires_text', CAST(si AS BIGINT),
       'text span must carry a non-null text'
  FROM spans WHERE k = 0 AND (did + si) % 11 = 0
UNION ALL
SELECT kdoc, 'media_ref_format', CAST(si AS BIGINT),
       'media_ref must match media://<hex16>'
  FROM spans WHERE k <> 0 AND (did + si) % 13 = 0
UNION ALL
SELECT kdoc, 'media_ref_exists', CAST(si AS BIGINT),
       'media_ref must exist in the media catalog'
  FROM spans WHERE k <> 0 AND (did + si) % 13 = 0
UNION ALL
SELECT kdoc, 'offset_nonnegative', CAST(si AS BIGINT),
       'span offset must be a non-negative int32'
  FROM spans WHERE off < 0
UNION ALL
SELECT kdoc, 'offset_monotonic', CAST(si AS BIGINT),
       'span offsets must be strictly increasing within a doc'
  FROM spans WHERE si >= 1 AND off <= prev_off
UNION ALL
SELECT kdoc, 'doc_id_unique', CAST(-1 AS BIGINT),
       'doc_id must be unique across the dataset'
  FROM (SELECT CASE WHEN doc_id % 101 = 0
                    THEN 'dup-' || CAST(doc_id % 3 AS VARCHAR)
                    ELSE CAST(doc_id AS VARCHAR) END AS kdoc
          FROM documents) GROUP BY kdoc HAVING count(*) > 1
""",
    "q18_large_orders": r"""
SELECT c_name, o_custkey, o_orderkey AS l_orderkey, o_orderdate,
       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS totalprice_c,
       sum_qty_c
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN (SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_qty_c
        FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) > 30000) q
  ON o_orderkey = q.l_orderkey
ORDER BY totalprice_c DESC, l_orderkey LIMIT 100
""",
    "stats_profile_by_source": r"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (text IS NULL) AS BIGINT) AS null_text,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_lang
FROM documents GROUP BY source
""",
    "inverted_index": r"""
WITH pairs AS (
  SELECT DISTINCT doc_id, tok AS token FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(COALESCE(text, ''), '\s+')) AS tok
    FROM documents) WHERE tok <> ''
), ranked AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
  FROM pairs
)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= 5 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS top_docs
FROM ranked GROUP BY token
""",
    # grouped HLL: same md5 hash / (idx, rho) split / estimator as
    # _hll_sql, with event_type threaded through every stage
    "hll_by_group": r"""
WITH hv AS (SELECT event_type,
                   md5_number_lower(CAST(user_id AS VARCHAR)) AS h
            FROM events WHERE user_id IS NOT NULL),
r AS (SELECT event_type, CAST(h >> 52 AS INTEGER) AS idx,
             53 - length(ltrim(bin(h & ((CAST(1 AS UBIGINT) << 52) - 1)),
                               '0')) AS rho
      FROM hv),
regs AS (SELECT event_type, idx, MAX(rho) AS rho
         FROM r GROUP BY event_type, idx),
hist AS (SELECT event_type, rho, count(*) AS n
         FROM regs GROUP BY event_type, rho
         UNION ALL
         SELECT event_type, 0 AS rho, 4096 - count(*) AS n
         FROM regs GROUP BY event_type),
est AS (SELECT event_type,
               CASE WHEN e <= 2.5 * 4096.0 AND z > 0
                    THEN 4096.0 * ln(4096.0 / z) ELSE e END AS v
        FROM (SELECT event_type,
                     (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
                     / SUM(n * power(2.0, -rho)) AS e,
                     COALESCE(SUM(CASE WHEN rho = 0 THEN n END), 0) AS z
              FROM hist GROUP BY event_type))
SELECT h.event_type, CAST(h.rho AS BIGINT) AS rho,
       CAST(h.n AS BIGINT) AS n_registers,
       CAST(ROUND(e.v, 0) AS BIGINT) AS distinct_est
FROM hist h JOIN est e USING (event_type) WHERE h.n > 0
""",
    "events_funnel": r"""
WITH s1 AS (SELECT user_id, min(ts) AS ts1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts >= s1.ts1
         AND e.ts <= s1.ts1 + INTERVAL 24 HOUR GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= s2.ts2
         AND e.ts <= s2.ts2 + INTERVAL 24 HOUR GROUP BY e.user_id)
SELECT 'view' AS stage, (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
UNION ALL
SELECT 'view>click', (SELECT CAST(count(*) AS BIGINT) FROM s2)
UNION ALL
SELECT 'view>click>purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3)
""",
    "latest_per_key": r"""
SELECT event_id, user_id, ts, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
""",
    "events_retention": r"""
WITH su AS (SELECT user_id, date_trunc('week', min(ts)) AS w0
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
act AS (SELECT DISTINCT e.user_id, su.w0,
               CAST(date_diff('week', su.w0, date_trunc('week', e.ts))
                    AS BIGINT) AS wk
        FROM events e JOIN su USING (user_id)
        WHERE date_trunc('week', e.ts) >= su.w0)
SELECT w0, wk, CAST(count(*) AS BIGINT) AS n_users
FROM act GROUP BY w0, wk
""",
    "val_childless_orders": r"""
SELECT o_orderkey FROM orders
WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                         WHERE l_orderkey IS NOT NULL)
""",
    "q10_returned_items": r"""
SELECT c_custkey AS o_custkey, c_name, n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_c,
       CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_c
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name, acctbal_c
ORDER BY revenue_c DESC, c_custkey LIMIT 20
""",
    "rollup_source_lang": r"""
SELECT CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS level,
       COALESCE(source, 'ALL') AS source,
       COALESCE(lang, 'ALL') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), ())
""",
    # minhash_pairs / minhash_verified / ann_topk / near_dup_embeddings:
    # approximate by construction (LSH banding / multiprobe recall) →
    # rows-only driver check; exactness of the underlying kernels is
    # covered by pytest.  (profile_interleaved graduated to a full
    # oracle in round 5 — see ORACLE["profile_interleaved"] below.)
}


def _hll_est_sub(values_sql: str) -> str:
    """Scalar subquery: the register-exact md5-HLL distinct estimate
    (identical estimator to ``functions.sketches.HyperLogLog`` and
    ``_hll_sql``) over a one-VARCHAR-column (``v``) SELECT."""
    return f"""(
WITH hv0 AS (SELECT md5_number_lower(v) AS h FROM ({values_sql})
             WHERE v IS NOT NULL),
r0 AS (SELECT CAST(h >> 52 AS INTEGER) AS idx,
              53 - length(ltrim(bin(h & ((CAST(1 AS UBIGINT) << 52) - 1)),
                                '0')) AS rho
       FROM hv0),
regs0 AS (SELECT idx, MAX(rho) AS rho FROM r0 GROUP BY idx),
hist0 AS (SELECT rho, count(*) AS n FROM regs0 GROUP BY rho
          UNION ALL
          SELECT 0 AS rho, 4096 - (SELECT count(*) FROM regs0) AS n),
est0 AS (SELECT CASE WHEN e <= 2.5 * 4096.0 AND z > 0
                     THEN 4096.0 * ln(4096.0 / z) ELSE e END AS v
         FROM (SELECT (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
                      / SUM(n * power(2.0, -rho)) AS e,
                      COALESCE(SUM(CASE WHEN rho = 0 THEN n END), 0) AS z
               FROM hist0))
SELECT CAST(ROUND(v, 0) AS BIGINT) FROM est0)"""


# The derived-interleaved profile, exact part by exact part: counts and
# nulls are plain aggregates over the span-derivation CTE (shared with
# span_kind_stats / flagship_validate), distinct_est re-derives the
# md5-HLL register state + estimator in SQL (hll_registers
# construction), p50 is quantile_disc over the derived offsets.
ORACLE["profile_interleaved"] = f"""
WITH spans AS (
  SELECT (d.doc_id*7 + s*3) % 5 AS k,
         CASE WHEN (d.doc_id % 23)=0 AND s=0 THEN -1
              WHEN (d.doc_id % 17)=0 AND s=1 THEN 0
              ELSE s*5 END AS off
  FROM documents d
  JOIN (SELECT unnest(generate_series(0, 2)) AS s) g
    ON g.s <= (d.doc_id % 3)
)
SELECT 'doc_id' AS "column",
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS "count",
       CAST(0 AS BIGINT) AS nulls,
       {_hll_est_sub('''SELECT CASE WHEN doc_id % 101 = 0
              THEN 'dup-' || CAST(doc_id % 3 AS VARCHAR)
              ELSE CAST(doc_id AS VARCHAR) END AS v FROM documents''')}
         AS distinct_est,
       CAST(-1.0 AS DOUBLE) AS p50
UNION ALL
SELECT 'spans.kind', (SELECT CAST(count(*) AS BIGINT) FROM spans),
       CAST(0 AS BIGINT),
       {_hll_est_sub('''SELECT list_extract(
             ['text','image','audio','table','video'],
             CAST((d.doc_id*7 + s*3) % 5 AS INTEGER) + 1) AS v
         FROM documents d
         JOIN (SELECT unnest(generate_series(0, 2)) AS s) g
           ON g.s <= (d.doc_id % 3)''')},
       CAST(-1.0 AS DOUBLE)
UNION ALL
SELECT 'spans.offset', (SELECT CAST(count(*) AS BIGINT) FROM spans),
       CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
       (SELECT CAST(quantile_disc(off, 0.5) AS DOUBLE) FROM spans)
"""

# TPC-H breadth module (the 12 remaining official-query shapes the
# trimmed tables can express — see pipelines/tpch.py for the
# adaptation notes and scale shapes).
from jsonschema_ray.pipelines.tpch import TPCH_ORACLE, TPCH_QUERIES  # noqa: E402

QUERIES.update(TPCH_QUERIES)
ORACLE.update(TPCH_ORACLE)


def q_passage_dedup(sf_dir: str):
    """Exact passage-level dedup (3-token passages so the synthetic
    corpus has real cross-doc duplicates — ~19% of passages at
    sf0.01): see dedup.passage_dedup for the scale shape."""
    from jsonschema_ray.pipelines.dedup import passage_dedup
    from jsonschema_ray.sources.readers import ParquetSource

    return passage_dedup(ParquetSource(_pq(sf_dir, "documents")),
                         passage_tokens=3)


QUERIES["passage_dedup"] = q_passage_dedup
ORACLE["passage_dedup"] = r"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r, tok
  FROM tp WHERE tok <> ''
), p AS (
  SELECT doc_id, (r - 1) // 3 AS pidx,
         string_agg(tok, ' ' ORDER BY r) AS ptext
  FROM th GROUP BY doc_id, (r - 1) // 3
), keep AS (
  SELECT doc_id, pidx, ptext,
         row_number() OVER (PARTITION BY ptext
                            ORDER BY doc_id, pidx) AS rn
  FROM p)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(ptext, ' ' ORDER BY pidx) AS clean_text
FROM keep WHERE rn = 1 GROUP BY doc_id
"""


def q_bigram_lm(sf_dir: str):
    """Bigram conditional-LM surprisal per doc (CCNet-style perplexity
    signal): see textops.bigram_lm_scores for the two-pass scale
    shape. Integer micro-nat sums → exact oracle hash."""
    from jsonschema_ray.pipelines.textops import bigram_lm_scores
    from jsonschema_ray.sources.readers import ParquetSource

    return bigram_lm_scores(ParquetSource(_pq(sf_dir, "documents")))


QUERIES["bigram_lm"] = q_bigram_lm
ORACLE["bigram_lm"] = r"""
WITH tp AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(COALESCE(text, ''), '\s+') AS l
        FROM documents)
), th AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS r, tok
  FROM tp WHERE tok <> ''
), bg AS (
  SELECT t0.doc_id, t0.tok AS w1, t1.tok AS w2
  FROM th t0 JOIN th t1 ON t1.doc_id = t0.doc_id AND t1.r = t0.r + 1
), bc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
), pfx AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS p FROM bc GROUP BY 1
), q AS (
  SELECT w1, w2,
         CAST(FLOOR(1e6 * ln(CAST(p AS DOUBLE) / c) + 0.5) AS BIGINT) AS q
  FROM bc JOIN pfx USING (w1))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(q) AS BIGINT) AS lm2_score
FROM bg JOIN q USING (w1, w2) GROUP BY doc_id
"""


def q_events_dense_rank(sf_dir: str):
    """DENSE_RANK window function per partition (ties share a rank and
    no rank is skipped — the semantics ROW_NUMBER queries like
    events_top_per_user can't express): each user's events at dense
    value-rank ≤ 2. Scale shape: users are BUCKETED by hash (pb =
    user_id % B) so one group = one partition-sized frame, never one
    pandas frame per user; the rank itself is one vectorized
    ``groupby.rank(method='dense')`` per bucket."""
    import pandas as pd
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    nb = max(2, min(64, cpus))

    def bucket(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        vc = _scale100(t.column("value"))
        return pa.table({"pb": pa.array((uid % nb).astype(np.int64)),
                         "user_id": t.column("user_id"),
                         "event_id": t.column("event_id"),
                         "value_c": vc})

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("user_id")["value_c"] \
            .rank(method="dense", ascending=False).astype(np.int64)
        g = g.assign(rnk=r)
        return g.loc[g["rnk"] <= 2,
                     ["user_id", "event_id", "value_c", "rnk"]]

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "value"])
    return ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby("pb").map_groups(rank, batch_format="pandas")


QUERIES["events_dense_rank"] = q_events_dense_rank
ORACLE["events_dense_rank"] = r"""
SELECT user_id, event_id,
       CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c,
       CAST(dense_rank() OVER (PARTITION BY user_id
                               ORDER BY FLOOR(value*100 + 0.5) DESC)
            AS BIGINT) AS rnk
FROM events
QUALIFY rnk <= 2
"""


def q_events_pivot(sf_dir: str):
    """PIVOT operator (long→wide): per calendar day, one count column
    per event type plus the exact cents sum of purchase values. Scale
    shape: the pivot happens INSIDE the per-block combiner (one
    int64 column per type, 5 fixed types), so the groupby shuffle
    carries |days| wide rows per block, never the long stream."""
    import pandas as pd

    from ray.data.aggregate import Sum

    TYPES = ["click", "error", "purchase", "signup", "view"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.floor("D")
        vc = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        base = pd.DataFrame({"day": day, "et": df["event_type"], "vc": vc})
        out = base.groupby("day", as_index=False).agg(n=("et", "size"))
        for ty in TYPES:
            m = base.loc[base["et"] == ty] \
                .groupby("day", as_index=False).agg(**{f"n_{ty}": ("et", "size")})
            out = out.merge(m, on="day", how="left")
        pv = base.loc[base["et"] == "purchase"] \
            .groupby("day", as_index=False).agg(purchase_value_c=("vc", "sum"))
        out = out.merge(pv, on="day", how="left")
        cols = [f"n_{t}" for t in TYPES] + ["purchase_value_c"]
        out[cols] = out[cols].fillna(0).astype(np.int64)
        return out.drop(columns=["n"])

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("day").aggregate(
            *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in TYPES],
            Sum("purchase_value_c", alias_name="purchase_value_c"))

    pivot_schema = pa.schema(
        [("day", pa.timestamp("us"))]
        + [(f"n_{t}", pa.int64()) for t in TYPES]
        + [("purchase_value_c", pa.int64())])

    def cast_day(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "day" not in t.schema.names:
            return pivot_schema.empty_table()
        i = t.schema.get_field_index("day")
        return t.set_column(i, "day",
                            t.column("day").cast(pa.timestamp("us")))

    return out.map_batches(cast_day, batch_format="pyarrow")


QUERIES["events_pivot"] = q_events_pivot
ORACLE["events_pivot"] = r"""
SELECT date_trunc('day', ts) AS day,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
         AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(COALESCE(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
                     FILTER (event_type = 'purchase'), 0) AS BIGINT)
         AS purchase_value_c
FROM events GROUP BY 1
"""


def q_mode_lang_per_source(sf_dir: str):
    """Grouped MODE aggregate (most frequent value per group, ties →
    lexicographically smallest): the statistical-mode aggregate the
    Sum/Min/Max family can't express. Scale shape: (source, lang)
    counts collapse per block, one thin groupby-sum, then a
    per-source argmax via a SECOND per-block partial argmax + packed
    (count, inverted-lang) Max merge — grouping never widens past the
    (source×lang) cardinality."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def pair_partial(t: pa.Table) -> pa.Table:
        lang = t.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        base = pa.table({"source": t.column("source"),
                         "lang": lang.fill_null(_NULL_KEY),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})
        return base.group_by(["source", "lang"]).aggregate([("one", "sum")]) \
            .rename_columns(["source", "lang", "n"])

    pairs = _read(sf_dir, "documents", columns=["source", "lang"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["source", "lang"]).aggregate(Sum("n", alias_name="n"))

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        # _NULL_KEY sorts after every real string = SQL NULLS LAST
        g = g.sort_values(["n", "lang"], ascending=[False, True],
                          kind="stable").head(1)
        g = g[["source", "lang", "n"]].rename(
            columns={"lang": "mode_lang", "n": "n_docs"})
        g.loc[g["mode_lang"] == _NULL_KEY, "mode_lang"] = None
        return g

    return pairs.groupby("source").map_groups(argmax, batch_format="pandas")


QUERIES["mode_lang_per_source"] = q_mode_lang_per_source
ORACLE["mode_lang_per_source"] = r"""
SELECT source, lang AS mode_lang, CAST(n AS BIGINT) AS n_docs
FROM (SELECT source, lang, count(*) AS n,
             row_number() OVER (PARTITION BY source
                                ORDER BY count(*) DESC, lang) AS rn
      FROM documents GROUP BY source, lang)
WHERE rn = 1
"""


def q_unpivot_source_stats(sf_dir: str):
    """UNPIVOT operator (wide→long): the per-source stats profile
    melted to (source, metric, value) rows — the inverse of
    events_pivot. Scale shape: the wide input is already
    group-cardinality small; melting is a zero-shuffle per-block
    column→row transpose (one value column repeated per metric)."""
    METRICS = ["n_docs", "null_text", "min_chars", "max_chars", "n_lang"]

    wide = q_stats_profile_by_source(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        srcs, mets, vals = [], [], []
        for m in METRICS:
            srcs.append(src)
            mets.append(pa.array(np.full(n, m), pa.string()))
            vals.append(t.column(m).cast(pa.int64()))
        return pa.table({
            "source": pa.concat_arrays([a.combine_chunks()
                                        if isinstance(a, pa.ChunkedArray)
                                        else a for a in srcs]),
            "metric": pa.concat_arrays(mets),
            "value": pa.concat_arrays([v.combine_chunks()
                                       if isinstance(v, pa.ChunkedArray)
                                       else v for v in vals])})

    return wide.map_batches(melt, batch_format="pyarrow")


QUERIES["unpivot_source_stats"] = q_unpivot_source_stats
ORACLE["unpivot_source_stats"] = r"""
WITH wide AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(*) FILTER (text IS NULL) AS BIGINT) AS null_text,
         CAST(min(n_chars) AS BIGINT) AS min_chars,
         CAST(max(n_chars) AS BIGINT) AS max_chars,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_lang
  FROM documents GROUP BY source)
SELECT source, metric, value
FROM wide UNPIVOT (value FOR metric IN
  (n_docs, null_text, min_chars, max_chars, n_lang))
"""


def q_left_join_orders_catalog(sf_dir: str):
    """LEFT OUTER hash join (big fact ⋈ restricted dimension, keeping
    unmatched facts): 1996Q1 orders joined to the customer catalog
    with every 10th customer dropped — unmatched orders surface with
    acctbal_c = -1 (coalesced sentinel so the dtype-strict oracle
    compare sees int64, not a float-widened null). Scale shape: both
    sides thin-projected at the scan; joins.hash_join 'left' mode
    (bucketed pandas merge over one hash shuffle, nullable-Int64
    right columns — never NaN widening)."""
    import datetime

    from jsonschema_ray.pipelines.joins import hash_join

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 4, 1)

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=(pc.field("o_orderdate") >= lo)
                   & (pc.field("o_orderdate") < hi)) \
        .map_batches(
            lambda t: t.filter(pc.and_(
                pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
                pc.less(t.column("o_orderdate"), pa.scalar(hi))))
            .select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow")

    def cust_thin(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy()
        t = t.filter(pa.array(ck % 10 != 0))
        return pa.table({"c_custkey": t.column("c_custkey"),
                         "acctbal_c": _scale100(t.column("c_acctbal"))})

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]) \
        .map_batches(cust_thin, batch_format="pyarrow")

    joined = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                       how="left",
                       left_schema=pa.schema([("o_orderkey", pa.int64()),
                                              ("o_custkey", pa.int64())]),
                       right_schema=pa.schema([("c_custkey", pa.int64()),
                                               ("acctbal_c", pa.int64())]))

    def seal(t: pa.Table) -> pa.Table:
        ab = t.column("acctbal_c")
        if isinstance(ab, pa.ChunkedArray):
            ab = ab.combine_chunks()
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "acctbal_c": ab.fill_null(-1).cast(pa.int64())})

    return joined.map_batches(seal, batch_format="pyarrow")


QUERIES["left_join_orders_catalog"] = q_left_join_orders_catalog
ORACLE["left_join_orders_catalog"] = r"""
SELECT o_orderkey, o_custkey,
       CAST(COALESCE(CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT), -1)
            AS BIGINT) AS acctbal_c
FROM orders LEFT OUTER JOIN
     (SELECT c_custkey, c_acctbal FROM customer
      WHERE c_custkey % 10 <> 0) c
  ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
"""


def q_histogram_nchars(sf_dir: str):
    """Equi-width HISTOGRAM aggregate: documents.n_chars bucketed into
    width-100 bins per source. Scale shape: the bin id is computed in
    the scan kernel (integer floor-div — no width_bucket float edges),
    per-block bincount partials collapse to ≤|source×bins| rows, one
    thin groupby-sum; the histogram never materializes the column."""
    from ray.data.aggregate import Sum

    WIDTH = 100

    def partial(t: pa.Table) -> pa.Table:
        nc = t.column("n_chars").to_numpy()
        base = pa.table({
            "source": t.column("source"),
            "bin_lo": pa.array((nc // WIDTH * WIDTH).astype(np.int64)),
            "one": pa.array(np.ones(t.num_rows, np.int64))})
        return base.group_by(["source", "bin_lo"]).aggregate(
            [("one", "sum")]).rename_columns(["source", "bin_lo", "n"])

    return _read(sf_dir, "documents", columns=["source", "n_chars"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "bin_lo"]).aggregate(Sum("n", alias_name="n"))


QUERIES["histogram_nchars"] = q_histogram_nchars
ORACLE["histogram_nchars"] = r"""
SELECT source, CAST(n_chars // 100 * 100 AS BIGINT) AS bin_lo,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2
"""


def q_users_setops(sf_dir: str):
    """Set operations (INTERSECT / EXCEPT) over derived key sets:
    users with a HIGH-VALUE (≥95) view vs a high-value purchase —
    both / view-only / purchase-only, counted. Scale shape: one pass;
    each block emits block-distinct (user, view-bit, purchase-bit)
    rows; a thin Max-merge groupby resolves global membership; the
    three set cardinalities are a ≤3-row combiner groupby over the
    membership table. No join, no driver sets."""
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.and_(
            pc.or_(pc.equal(et, "view"), pc.equal(et, "purchase")),
            pc.greater_equal(t.column("value"), 95.0))
        t = t.filter(keep)
        base = pa.table({
            "user_id": t.column("user_id"),
            "v": pc.equal(t.column("event_type"), "view").cast(pa.int64()),
            "p": pc.equal(t.column("event_type"), "purchase")
            .cast(pa.int64())})
        return base.group_by("user_id").aggregate(
            [("v", "max"), ("p", "max")]) \
            .rename_columns(["user_id", "v", "p"])

    member = hash_group_agg(
        _read(sf_dir, "events", columns=["user_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        "user_id", {"v": ("v", "max"), "p": ("p", "max")})

    def label(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy()
        p = t.column("p").to_numpy()
        names = np.where(v & p, "both",
                         np.where(v == 1, "view_only", "purchase_only"))
        base = pa.table({"set_name": pa.array(names.astype(object),
                                              pa.string()),
                         "one": pa.array(np.ones(len(v), np.int64))})
        return base.group_by("set_name").aggregate([("one", "sum")]) \
            .rename_columns(["set_name", "n_users"])

    out = member.map_batches(label, batch_format="pyarrow") \
        .groupby("set_name").aggregate(Sum("n_users", alias_name="n_users"))
    # the SQL emits all three set rows even at count 0; an empty set
    # would otherwise simply be absent from the groupby output
    got = {r["set_name"]: int(r["n_users"])
           for r in out.take_all()}  # ≤3 rows by construction
    names = ["both", "view_only", "purchase_only"]
    return pa.table({
        "set_name": pa.array(names, pa.string()),
        "n_users": pa.array([got.get(n, 0) for n in names], pa.int64())})


QUERIES["users_setops"] = q_users_setops
ORACLE["users_setops"] = r"""
WITH v AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'view' AND value >= 95),
p AS (SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND value >= 95)
SELECT 'both' AS set_name,
       CAST((SELECT count(*) FROM (SELECT * FROM v INTERSECT SELECT * FROM p))
            AS BIGINT) AS n_users
UNION ALL
SELECT 'view_only',
       CAST((SELECT count(*) FROM (SELECT * FROM v EXCEPT SELECT * FROM p))
            AS BIGINT)
UNION ALL
SELECT 'purchase_only',
       CAST((SELECT count(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM v))
            AS BIGINT)
"""


def q_render_interleaved(sf_dir: str):
    """Interleaved-document RENDERING: the read-side inverse of span
    flattening — each document's spans serialized in reading order
    (text spans contribute their text, '' when null; media spans a
    '[kind:ref]' placeholder), the export/inspection step of an
    interleaved-corpus pipeline. Scale shape: spans are derived and
    reassembled BLOCK-LOCALLY (docs never straddle blocks), so the
    whole render is a zero-shuffle vectorized map: one np.where piece
    selection + one ListArray ``pc.binary_join`` per block."""

    def render(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_spans, parent, s, kind, text, ref, offset = _derive_spans(ids)
        d = ids[parent]
        k = (d * 7 + s * 3) % 5
        txt = np.where(text == None, "", text)            # noqa: E711
        rf = np.where(ref == None, "", ref)               # noqa: E711
        media = np.char.add(np.char.add(np.char.add(np.char.add(
            "[", kind.astype(str)), ":"), rf.astype(str)), "]")
        piece = np.where(k == 0, txt, media).astype(object)
        offs = np.concatenate(([0], np.cumsum(n_spans))).astype(np.int32)
        pieces = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(piece, type=pa.string()))
        rendered = pc.binary_join(pieces, " ")
        return pa.table({
            "doc_id": pa.array(ids.astype("U20"), pa.string()),
            "n_spans": pa.array(n_spans),
            "rendered": rendered})

    return _read(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(render, batch_format="pyarrow")


QUERIES["render_interleaved"] = q_render_interleaved
ORACLE["render_interleaved"] = r"""
WITH spans AS (
  SELECT d.doc_id AS did, s AS si,
         (d.doc_id*7 + s*3) % 5 AS k,
         list_extract(['text','image','audio','table','video'],
                      CAST((d.doc_id*7 + s*3) % 5 AS INTEGER) + 1) AS kind,
         CASE WHEN (d.doc_id*7 + s*3) % 5 = 0
                   AND (d.doc_id + s) % 11 = 0 THEN NULL
              WHEN (d.doc_id*7 + s*3) % 5 = 0 THEN 'tok'
              ELSE NULL END AS txt,
         CASE WHEN (d.doc_id*7 + s*3) % 5 = 0 THEN NULL
              WHEN (d.doc_id + s) % 13 = 0 THEN 'http://bad'
              ELSE 'media://0123456789abcdef' END AS ref
  FROM documents d
  JOIN (SELECT unnest(generate_series(0, 2)) AS s) g
    ON g.s <= (d.doc_id % 3)
)
SELECT CAST(did AS VARCHAR) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       string_agg(CASE WHEN k = 0 THEN COALESCE(txt, '')
                       ELSE '[' || kind || ':' || COALESCE(ref, '') || ']'
                  END, ' ' ORDER BY si) AS rendered
FROM spans GROUP BY did
"""


def q_scrub_interleaved(sf_dir: str):
    """Violation-driven SPAN REMOVAL + re-render — the content-repair
    composition: spans failing their conformance rules (text span with
    null text; media span whose ref fails the media:// format) are
    DROPPED and the cleaned document re-rendered from the survivors,
    with per-doc drop accounting. Scale shape: identical to
    render_interleaved — spans derive and reassemble BLOCK-LOCALLY
    (zero shuffle), one vectorized keep-mask + offset rebuild +
    ``pc.binary_join`` per block."""

    def scrub(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_spans, parent, s, kind, text, ref, offset = _derive_spans(ids)
        d = ids[parent]
        k = (d * 7 + s * 3) % 5
        is_text = k == 0
        txt_null = text == None                           # noqa: E711
        ref_ok = np.char.startswith(
            np.where(ref == None, "", ref).astype(str),   # noqa: E711
            "media://")
        keep = np.where(is_text, ~txt_null, ref_ok)
        # rebuild per-doc list offsets over the kept spans only
        ends = np.cumsum(n_spans)
        starts = ends - n_spans
        csum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
        n_kept = csum[ends] - csum[starts]
        txt = np.where(txt_null, "", text)
        rf = np.where(ref == None, "", ref)               # noqa: E711
        media = np.char.add(np.char.add(np.char.add(np.char.add(
            "[", kind.astype(str)), ":"), rf.astype(str)), "]")
        piece = np.where(is_text, txt, media).astype(object)[keep]
        offs = np.concatenate(([0], np.cumsum(n_kept))).astype(np.int32)
        pieces = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(piece, type=pa.string()))
        return pa.table({
            "doc_id": pa.array(ids.astype("U20"), pa.string()),
            "n_spans": pa.array(n_spans),
            "n_dropped": pa.array((n_spans - n_kept).astype(np.int64)),
            "rendered": pc.binary_join(pieces, " ")})

    return _read(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(scrub, batch_format="pyarrow")


QUERIES["scrub_interleaved"] = q_scrub_interleaved
ORACLE["scrub_interleaved"] = r"""
WITH spans AS (
  SELECT d.doc_id AS did, s AS si,
         (d.doc_id*7 + s*3) % 5 AS k,
         list_extract(['text','image','audio','table','video'],
                      CAST((d.doc_id*7 + s*3) % 5 AS INTEGER) + 1) AS kind,
         CASE WHEN (d.doc_id*7 + s*3) % 5 = 0
                   AND (d.doc_id + s) % 11 = 0 THEN NULL
              WHEN (d.doc_id*7 + s*3) % 5 = 0 THEN 'tok'
              ELSE NULL END AS txt,
         CASE WHEN (d.doc_id*7 + s*3) % 5 = 0 THEN NULL
              WHEN (d.doc_id + s) % 13 = 0 THEN 'http://bad'
              ELSE 'media://0123456789abcdef' END AS ref
  FROM documents d
  JOIN (SELECT unnest(generate_series(0, 2)) AS s) g
    ON g.s <= (d.doc_id % 3)
), flagged AS (
  SELECT *, CASE WHEN k = 0 THEN txt IS NOT NULL
                 ELSE COALESCE(ref, '') LIKE 'media://%' END AS keep
  FROM spans
)
SELECT CAST(did AS VARCHAR) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) - count(*) FILTER (WHERE keep) AS BIGINT)
           AS n_dropped,
       COALESCE(string_agg(
           CASE WHEN k = 0 THEN COALESCE(txt, '')
                ELSE '[' || kind || ':' || COALESCE(ref, '') || ']' END,
           ' ' ORDER BY si) FILTER (WHERE keep), '') AS rendered
FROM flagged GROUP BY did
"""


def q_events_moving_sum(sf_dir: str):
    """Moving-window aggregate over an ordered partition (ROWS BETWEEN
    3 PRECEDING AND CURRENT ROW): per user, each event's trailing-4
    value sum in exact cents — the bounded-frame window shape the
    cumulative running_window query doesn't cover. Scale shape:
    user-hash buckets (one frame per bucket, never per user), one
    vectorized ``groupby.rolling(4, min_periods=1).sum`` per bucket."""
    import pandas as pd
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    nb = max(2, min(64, cpus))

    def bucket(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        return pa.table({"pb": pa.array((uid % nb).astype(np.int64)),
                         "user_id": t.column("user_id"),
                         "event_id": t.column("event_id"),
                         "ts": t.column("ts"),
                         "value_c": _scale100(t.column("value"))})

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ms = g.groupby("user_id")["value_c"] \
            .rolling(4, min_periods=1).sum() \
            .reset_index(level=0, drop=True).astype(np.int64)
        return g.assign(moving_sum_c=ms)[
            ["user_id", "event_id", "value_c", "moving_sum_c"]]

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "value"])
    return ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby("pb").map_groups(roll, batch_format="pandas")


QUERIES["events_moving_sum"] = q_events_moving_sum
ORACLE["events_moving_sum"] = r"""
SELECT user_id, event_id,
       CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS moving_sum_c
FROM events
"""


def q_snapshot_diff(sf_dir: str):
    """Snapshot DIFF (the FULL OUTER JOIN shape): compare the documents
    table against a derived snapshot B (every 37th doc dropped, every
    41st doc's text mutated, 50 new ids appended) and emit one row per
    difference — added / removed / changed. Scale shape: the full
    outer join is a tag-union — each side ships only (doc_id,
    text-hash-as-int, side-bit); one thin Max-merge groupby resolves
    presence + equality; no text ever shuffles (md5 lower-64 content
    hash, the same SQL-reproducible hash the split/bloom family
    uses)."""
    from pandas import isnull as pd_isnull

    from ray.data.aggregate import Max

    from jsonschema_ray.functions.sketches import md5_hash64

    def h63(texts: np.ndarray) -> np.ndarray:
        # md5 lower-64 >> 1: fits int64, SQL = md5_number_lower >> 1.
        # null text hashes as '' (COALESCE in the oracle) so a
        # null-text doc diffs like an empty one instead of crashing
        # the hash kernel
        obj = texts.astype(object)
        obj[pd_isnull(obj)] = ""
        return (md5_hash64(obj) >> np.uint64(1)).astype(np.int64)

    def side_a(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids),
                         "ha": pa.array(h63(txt)),
                         "hb": pa.array(np.full(len(ids), -1, np.int64))})

    def side_b(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        txt = t.column("text").to_numpy(zero_copy_only=False).copy()
        keep = ids % 37 != 0
        ids, txt = ids[keep], txt[keep]
        txt[pd_isnull(txt)] = ""
        mut = ids % 41 == 0
        txt[mut] = np.char.add(txt[mut].astype(str), " [rev2]")
        mx = 100_000_000
        new_ids = mx + np.arange(50, dtype=np.int64)
        new_txt = np.array([f"new doc {i}" for i in range(50)], object)
        ids = np.concatenate([ids, new_ids])
        txt = np.concatenate([txt.astype(object), new_txt])
        return pa.table({"doc_id": pa.array(ids),
                         "ha": pa.array(np.full(len(ids), -1, np.int64)),
                         "hb": pa.array(h63(txt))})

    a = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(side_a, batch_format="pyarrow")
    b = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(side_b, batch_format="pyarrow")

    merged = hash_group_agg(a.union(b), "doc_id",
                            {"ha": ("ha", "max"), "hb": ("hb", "max")})

    def label(t: pa.Table) -> pa.Table:
        ha = t.column("ha").to_numpy()
        hb = t.column("hb").to_numpy()
        change = np.where(ha < 0, "added",
                          np.where(hb < 0, "removed",
                                   np.where(ha != hb, "changed", "same")))
        keep = change != "same"
        return pa.table({
            "doc_id": pa.array(t.column("doc_id").to_numpy()[keep]),
            "change": pa.array(change[keep].astype(object), pa.string())})

    return merged.map_batches(label, batch_format="pyarrow")


QUERIES["snapshot_diff"] = q_snapshot_diff
ORACLE["snapshot_diff"] = r"""
WITH a AS (
  SELECT doc_id, md5_number_lower(COALESCE(text, '')) >> 1 AS h
  FROM documents),
b AS (
  SELECT doc_id,
         md5_number_lower(CASE WHEN doc_id % 41 = 0
                               THEN COALESCE(text, '') || ' [rev2]'
                               ELSE COALESCE(text, '') END) >> 1 AS h
  FROM documents WHERE doc_id % 37 <> 0
  UNION ALL
  SELECT 100000000 + i AS doc_id,
         md5_number_lower('new doc ' || CAST(i AS VARCHAR)) >> 1 AS h
  FROM (SELECT unnest(generate_series(0, 49)) AS i)),
j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.h AS ha, b.h AS hb
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
SELECT doc_id,
       CASE WHEN ha IS NULL THEN 'added'
            WHEN hb IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM j WHERE ha IS NULL OR hb IS NULL OR ha <> hb
"""


def q_events_window_suite(sf_dir: str):
    """Window-function completeness in one pass: per event — RANK by
    value (deterministic event_id tie-break), NTILE(4) quartile over
    the time order, FIRST_VALUE / LAST_VALUE of the partition, and
    the LEAD gap to the next event in whole seconds (second-boundary
    crossings, -1 sentinel on the partition's last row). Scale shape:
    user-hash buckets (one vectorized frame per bucket, never per
    user); every window is a sort + groupby-transform — no Python
    loop over rows or groups."""
    import pandas as pd
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    nb = max(2, min(64, cpus))

    def bucket(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        return pa.table({"pb": pa.array((uid % nb).astype(np.int64)),
                         "user_id": t.column("user_id"),
                         "event_id": t.column("event_id"),
                         "ts": t.column("ts"),
                         "value_c": _scale100(t.column("value"))})

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        # time order: ts, event_id
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="stable").reset_index(drop=True)
        grp = g.groupby("user_id", sort=False)
        n = grp["event_id"].transform("size").to_numpy()
        i = grp.cumcount().to_numpy()
        # SQL NTILE(4): the first n%4 buckets get ceil(n/4) rows
        base, rem = n // 4, n % 4
        big = rem * (base + 1)
        quartile = np.where(i < big, i // np.maximum(base + 1, 1),
                            rem + (i - big) // np.maximum(base, 1)) + 1
        first_vc = grp["value_c"].transform("first").to_numpy()
        last_vc = grp["value_c"].transform("last").to_numpy()
        # LEAD gap in second-boundary crossings (DuckDB date_diff)
        sec = g["ts"].dt.floor("s")
        nxt = sec.shift(-1)
        same = g["user_id"].to_numpy()
        gap = (nxt - sec).dt.total_seconds()
        gap = gap.to_numpy()
        last_row = np.r_[same[:-1] != same[1:], True]
        gap_s = np.where(last_row, -1, gap).astype(np.int64)
        # RANK by (value_c desc, event_id) — unique tie-break, so rank
        # equals the row position in that order
        order = g.sort_values(["user_id", "value_c", "event_id"],
                              ascending=[True, False, True],
                              kind="stable").index.to_numpy()
        rnk = np.empty(len(g), np.int64)
        pos = g.loc[order].groupby("user_id", sort=False) \
            .cumcount().to_numpy() + 1
        rnk[order] = pos
        return pd.DataFrame({
            "user_id": g["user_id"], "event_id": g["event_id"],
            "value_c": g["value_c"],
            "rnk": rnk, "quartile": quartile.astype(np.int64),
            "first_vc": first_vc, "last_vc": last_vc, "gap_s": gap_s})

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_id", "ts", "value"])
    return ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby("pb").map_groups(windows, batch_format="pandas")


QUERIES["events_window_suite"] = q_events_window_suite
ORACLE["events_window_suite"] = r"""
SELECT user_id, event_id,
       CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_c,
       CAST(rank() OVER (PARTITION BY user_id
                         ORDER BY FLOOR(value*100 + 0.5) DESC, event_id)
            AS BIGINT) AS rnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       CAST(first_value(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS first_vc,
       CAST(last_value(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING) AS BIGINT) AS last_vc,
       CAST(COALESCE(date_diff('second', ts, lead(ts) OVER w), -1)
            AS BIGINT) AS gap_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# TPC-H Q2/Q9/Q11/Q16/Q20 over the arithmetically-synthesized partsupp
# (see tpch_partsupp.py — the oracle reproduces the generator in a CTE)
from jsonschema_ray.pipelines.tpch_partsupp import (  # noqa: E402
    PARTSUPP_ORACLE, PARTSUPP_QUERIES)

QUERIES.update(PARTSUPP_QUERIES)
ORACLE.update(PARTSUPP_ORACLE)


# ---------------------------------------------------------------------------
# Driver-sample ordering.
#
# The correctness driver samples 50 queries per round and is
# insertion-order-sensitive; after three rounds, 60 of the 124 queries
# (the whole TPC-H / window / curation wave) have never had a green
# driver CORRECTNESS row. Surface exactly those first — the
# oracled-never-recorded entries lead, then the rows-only
# never-recorded, then everything already recorded green,
# preserving relative order within each tier.
#
# The "already recorded" set is computed DYNAMICALLY from the
# CORRECTNESS_r*.json files at the repo root (written by the driver
# after each round), so each round's 50-slot sample automatically
# front-loads whatever still lacks a green row — no per-round
# hand-editing. _DRIVER_PRIORITY below only fixes the relative order
# within the never-recorded tier (flagship first, then the round-3
# wave, then later additions in registration order).


def _driver_green_queries() -> set:
    """Queries that already have the best driver record they can get:
    oracled queries with a triple-green row, or rows-only queries with
    a clean spark_rows count (the driver records those as
    err='no_oracle' + spark_rows)."""
    import glob as _glob
    import json as _json
    import os as _os

    root = _os.path.dirname(_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__))))
    green: set = set()
    # repo-root marker guard (ADVICE r4): only trust CORRECTNESS_r*.json
    # files that sit next to the driver entrypoint — an installed
    # site-packages layout would otherwise glob an unrelated directory
    # and make registry ordering vary by environment.
    if not _os.path.exists(_os.path.join(root, "__ray_entry__.py")):
        return green
    for path in sorted(_glob.glob(_os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                recs = _json.load(fh)
        except Exception:
            continue
        if not isinstance(recs, dict):
            continue
        for name, rec in recs.items():
            if not isinstance(rec, dict):
                continue
            if name in ORACLE:
                if (rec.get("err") is None and rec.get("rows_match")
                        and rec.get("schema_match") and rec.get("hash_match")):
                    green.add(name)
            else:
                if (rec.get("err") in (None, "no_oracle")
                        and rec.get("spark_rows") is not None):
                    green.add(name)
    return green


_DRIVER_PRIORITY = [
    # tier 1: oracled, never green in any driver round (50 = one sample)
    "flagship_validate",
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q10_returned_items", "q12_linestatus_priority",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_quantity", "q18_large_orders", "q19_disjunctive_revenue",
    "q21_waiting_supplier", "q22_dormant_customers",
    "events_window_suite", "events_moving_sum", "events_dense_rank",
    "events_funnel", "events_retention", "latest_per_key", "events_pivot",
    "snapshot_diff",
    "rollup_source_lang", "mode_lang_per_source", "unpivot_source_stats",
    "left_join_orders_catalog", "histogram_nchars", "users_setops",
    "inverted_index", "hll_by_group", "stats_profile_by_source",
    "span_kind_stats", "val_childless_orders", "zscore_outliers",
    "render_interleaved",
    "passage_dedup", "bigram_lm", "unigram_lm_topk", "tfidf_top_terms",
    "quality_filter", "cms_registers", "cms_topk", "rebalance_sources",
    "pack_sequences", "psi_drift", "ks_drift", "minhash_verified_joined",
    "dup_clusters_scale", "embedding_decontaminate",
    # round-5 oracle graduation: exact-part profile + HLL certificate
    "profile_interleaved",
    # tier 2: rows-only, never recorded
    "kmeans_embeddings", "semdedup",
    "media_features_real", "phash_near_dup", "audio_near_dup",
    "video_near_dup", "interleaved_media_decode", "lint_schemas_scale",
    "metaschema_scale",
    # tier 3: new in round 4 (synthesized-partsupp TPC-H completions)
    "q2_min_cost_supplier", "q9_product_type_profit",
    "q11_important_stock", "q16_parts_supplier_relationship",
    "q20_potential_promotion",
]

_base = [k for k in _DRIVER_PRIORITY if k in QUERIES] + \
    [k for k in QUERIES if k not in _DRIVER_PRIORITY]
_green = _driver_green_queries()
# Stable three-tier sort: never-green oracled < never-green rows-only
# < already-green; _base order preserved inside each tier.
_ordered = (
    [k for k in _base if k not in _green and k in ORACLE]
    + [k for k in _base if k not in _green and k not in ORACLE]
    + [k for k in _base if k in _green]
)
QUERIES = {k: QUERIES[k] for k in _ordered}
ORACLE = {k: ORACLE[k] for k in _ordered if k in ORACLE}
