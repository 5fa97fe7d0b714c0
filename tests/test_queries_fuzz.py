"""Randomized differential fuzz for the events/documents relational
query families: tiny random tables with the driver's exact schemas —
including NULL text/lang, empty strings, duplicate timestamps and
single-event users — run against the same DuckDB oracle SQL the
driver uses."""

import datetime

import duckdb
import numpy as np
import pandas as pd
import pytest

from jsonschema_ray.pipelines.queries import ORACLE, QUERIES
from tests.test_tpch import _norm

# cheap, deterministic, SQL-oracled queries over events/documents
FUZZ_QUERIES = [
    "events_hourly", "events_hopping", "events_sessionize",
    "events_running_window", "events_top_per_user", "events_debounce",
    "events_dense_rank", "events_moving_sum", "events_pivot",
    "events_window_suite", "events_retention", "events_funnel",
    "latest_per_key", "users_setops",
    "val_lang_enum", "val_nchars_range", "val_unique_user",
    "histogram_nchars", "mode_lang_per_source", "unpivot_source_stats",
    "stats_profile_by_source", "rollup_source_lang",
    "token_count", "quality_counts", "langid", "distinct_mktsegment",
    "sort_topk_orders", "left_join_orders_catalog",
    "val_childless_orders", "snapshot_diff", "split_assign",
    # curation / dedup / sampling families (null-text and null-stratum
    # contracts exercised by the planted nulls)
    "token_topk", "tfidf_top_terms", "unigram_lm", "unigram_lm_topk",
    "bigram_lm", "passage_dedup", "chunk_documents", "redact_text",
    "normalize_text", "dedup_prefix_groups", "dedup_exact_summary",
    "simhash", "winnow_fingerprints", "decontaminate", "cms_registers",
    "hll_registers", "gopher_rules", "repetition_signals",
    "bpe_token_count", "string_funcs_documents", "weighted_sample",
    "stratified_sample", "exact_quantiles", "grouped_quantiles",
    "zscore_outliers", "quality_filter", "domain_cap",
    "rebalance_sources", "boilerplate_ngrams", "substring_scrub",
    "repeated_substrings",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _write_corpus(tmp, rng) -> str:
    n_ev, n_doc, n_ord, n_cust = 400, 60, 60, 25

    ts = pd.to_datetime(
        np.sort(rng.integers(0, 3_000_000, n_ev)), unit="s",
        origin=datetime.datetime(1996, 1, 1))
    # plant duplicate timestamps and a single-event user
    ts.values[10] = ts.values[11]
    users = rng.integers(1, 12, n_ev)
    users[0] = 99  # exactly one event
    events = pd.DataFrame({
        "event_id": np.arange(1, n_ev + 1),
        "ts": ts,
        "user_id": users.astype(np.int64),
        "event_type": rng.choice(
            ["view", "click", "purchase", "signup", "error"], n_ev),
        "value": np.round(rng.uniform(0, 200, n_ev), 2),
        "props": rng.choice(["{}", '{"k":1}', ""], n_ev)})

    vocab = np.array(["alpha", "beta", "gamma", "delta", "x"])
    texts: list = [" ".join(rng.choice(vocab, rng.integers(0, 15)))
                   for _ in range(n_doc)]
    texts[3] = None          # null text
    texts[4] = ""            # empty text
    texts[7] = texts[9]      # exact duplicate
    langs = rng.choice(["en", "fr", "es", "xx"], n_doc).astype(object)
    langs[5] = None          # null lang
    documents = pd.DataFrame({
        "doc_id": np.arange(1, n_doc + 1),
        "text": texts,
        "lang": langs,
        "source": rng.choice(["web", "books", "code"], n_doc),
        "n_chars": np.r_[rng.integers(0, 900, n_doc - 1),
                         50_000].astype(np.int64)})  # planted outlier

    customer = pd.DataFrame({
        "c_custkey": np.arange(1, n_cust + 1),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(["BUILDING", "AUTOMOBILE"], n_cust)})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, n_ord + 1),
        "o_custkey": rng.integers(1, n_cust + 1, n_ord),
        "o_orderstatus": rng.choice(["F", "O", "P"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": pd.to_datetime(
            rng.integers(0, 2000, n_ord), unit="D",
            origin=datetime.datetime(1995, 1, 1)),
        "o_orderpriority": rng.choice(["1-URGENT", "5-LOW"], n_ord)})
    lineitem = pd.DataFrame({
        "l_orderkey": rng.integers(1, n_ord + 3, 150),  # some childless
        "l_partkey": rng.integers(1, 10, 150),
        "l_suppkey": rng.integers(1, 5, 150),
        "l_linenumber": np.arange(150, dtype=np.int32) % 7 + 1,
        "l_quantity": rng.integers(1, 51, 150).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, 150), 2),
        "l_discount": np.round(rng.integers(0, 11, 150) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, 150) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], 150),
        "l_linestatus": rng.choice(["O", "F"], 150),
        "l_shipdate": pd.to_datetime(
            rng.integers(0, 2000, 150), unit="D",
            origin=datetime.datetime(1995, 1, 1))})
    # childless orders must still exist in orders for the check
    lineitem.loc[:2, "l_orderkey"] = [1, 1, 2]

    region = pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]})
    nation = pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32)})
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(1, 5),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, 5)],
        "s_nationkey": rng.integers(0, 25, 4).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(0, 9000, 4), 2)})
    part = pd.DataFrame({
        "p_partkey": np.arange(1, 10),
        "p_name": [f"part {i}" for i in range(1, 10)],
        "p_brand": rng.choice(["Brand#12", "Brand#9"], 9),
        "p_type": rng.choice(["PROMO", "SMALL"], 9),
        "p_size": rng.integers(1, 51, 9).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 2000, 9), 2)})
    embeddings = pd.DataFrame({
        "vec_id": np.arange(1, 9),
        "embedding": [rng.normal(size=8).astype(np.float32).tolist()
                      for _ in range(8)],
        "label": rng.integers(0, 3, 8).astype(np.int32)})

    # the driver's tables carry timestamp[us] (TESTDATA.md / the
    # input_hint contract); pandas would write ns by default
    events["ts"] = events["ts"].astype("datetime64[us]")
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    lineitem["l_shipdate"] = lineitem["l_shipdate"].astype("datetime64[us]")
    # guarantee the 1996Q1 left-join window is non-empty
    orders.loc[:3, "o_orderdate"] = np.datetime64("1996-02-01", "us")
    for name, df in [("events", events), ("documents", documents),
                     ("customer", customer), ("orders", orders),
                     ("lineitem", lineitem), ("region", region),
                     ("nation", nation), ("supplier", supplier),
                     ("part", part), ("embeddings", embeddings)]:
        df.to_parquet(f"{tmp}/{name}.parquet", index=False)
    return str(tmp)


@pytest.mark.parametrize("seed", [17, 29])
def test_relational_queries_fuzz_match_duckdb(ray_session, tmp_path, seed):
    sf_dir = _write_corpus(tmp_path, np.random.default_rng(seed))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name in FUZZ_QUERIES:
        try:
            res = QUERIES[name](sf_dir)
            got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            want = con.execute(ORACLE[name]).df()
            if len(got) != len(want):
                bad.append((name, f"rows {len(got)} vs {len(want)}"))
            elif len(got) == 0 and got.shape[1] == 0:
                # both sides empty and the Dataset arrived as ZERO
                # blocks: Ray's to_pandas drops empty blocks (schema
                # and all), so the dtype comparison is unavailable —
                # row-count agreement is the checkable contract here
                pass
            elif _norm(got) != _norm(want):
                kind = "dtypes" if _norm(got)[0] != _norm(want)[0] \
                    else "values"
                bad.append((name, kind))
        except Exception as e:  # pragma: no cover - failure reporting
            bad.append((name, f"CRASH {type(e).__name__}: {str(e)[:80]}"))
    con.close()
    assert not bad, bad
