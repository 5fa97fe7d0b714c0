"""End-to-end validation pipeline vs the pure-Python oracle.

The BASELINE.json contract: exact violation-row set equality on
``(doc_id, rule_id, span_index)``, per-partition pass/fail, span-
sequence equality for passing docs, and determinism across block
layouts.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from jsonschema_ray.pipelines.validate import fast_validate, validate
from jsonschema_ray.sources.readers import DatasetSource, SynthSource
from jsonschema_ray.sources.synth import GenConfig, catalog_table, docs_table
from jsonschema_ray.spec.plan import default_plan
from tests.oracle import failing_docs_row_local, oracle_violations


def _catalog_keys(cfg):
    return catalog_table(cfg).column("media_ref").combine_chunks()


def _key_set(result) -> set:
    t = result.table()
    return set(zip(t.column("doc_id").to_pylist(),
                   t.column("rule_id").to_pylist(),
                   t.column("span_index").to_pylist()))


@pytest.fixture(scope="module")
def small(ray_session):
    cfg = GenConfig(n_docs=1000)
    table = docs_table(cfg)
    cat = _catalog_keys(cfg)
    expected = oracle_violations(table.to_pylist(), default_plan(),
                                 set(cat.to_pylist()))
    return cfg, table, cat, expected


def test_exact_violation_rows(ray_session, small):
    import ray.data as rd

    cfg, table, cat, expected = small
    res = validate(DatasetSource(rd.from_arrow(table)), catalog_keys=cat)
    got = _key_set(res)
    assert got == expected, (
        f"missing={sorted(expected - got)[:5]} extra={sorted(got - expected)[:5]}")
    assert res.exit_code() == 2
    assert len(expected) > 20  # the fixture really injects violations


def test_all_rule_ids_fire(ray_session, small):
    _, _, _, expected = small
    fired = {r for _, r, _ in expected}
    assert fired == {"kind_enum", "text_requires_text", "media_requires_ref",
                     "media_ref_format", "offset_monotonic", "offset_nonnegative",
                     "doc_id_unique", "media_ref_exists"}


def test_clean_table_passes(ray_session):
    import ray.data as rd

    cfg = GenConfig(n_docs=500, clean=True)
    res = validate(DatasetSource(rd.from_arrow(docs_table(cfg))),
                   catalog_keys=_catalog_keys(cfg))
    assert res.overall_pass()
    assert res.exit_code() == 0
    verdicts = res.partition_verdicts()
    assert pc.all(verdicts.column("passed")).as_py()


def test_determinism_across_block_layouts(ray_session, small):
    cfg, _, cat, _ = small
    a = validate(SynthSource(cfg, override_num_blocks=2), catalog_keys=cat)
    b = validate(SynthSource(cfg, override_num_blocks=7), catalog_keys=cat)
    assert a.sorted_table().equals(b.sorted_table())


def test_partition_verdicts(ray_session, small):
    import ray.data as rd

    cfg, table, cat, expected = small
    res = validate(DatasetSource(rd.from_arrow(table)), catalog_keys=cat,
                   num_partitions=8)
    v = res.partition_verdicts()
    assert v.num_rows == 8
    assert int(pc.sum(v.column("n_violations")).as_py()) == len(expected)
    # a partition passes iff no violation landed in it
    assert v.column("passed").to_pylist() == \
        [n == 0 for n in v.column("n_violations").to_pylist()]


def test_only_exclude_filters(ray_session, small):
    import ray.data as rd

    cfg, table, cat, expected = small
    res = validate(DatasetSource(rd.from_arrow(table)), catalog_keys=cat,
                   only=["kind_enum"])
    assert _key_set(res) == {k for k in expected if k[1] == "kind_enum"}

    res2 = validate(DatasetSource(rd.from_arrow(table)), catalog_keys=cat,
                    exclude=["kind_enum", "doc_id_unique"])
    assert _key_set(res2) == {k for k in expected
                              if k[1] not in ("kind_enum", "doc_id_unique")}


def test_fast_mode_verdict(ray_session, small):
    import ray.data as rd

    cfg, table, cat, expected = small
    out = fast_validate(DatasetSource(rd.from_arrow(table)), catalog_keys=cat)
    assert out["docs"] == table.num_rows
    want_failed = failing_docs_row_local(table.to_pylist(), default_plan(),
                                         set(cat.to_pylist()))
    assert out["failed_docs"] == len(want_failed)
    assert not out["passed"]
    dup_keys = {k for k, r, _ in expected if r == "doc_id_unique"}
    assert out["dup_keys"] == len(dup_keys)


def test_span_sequence_passthrough(ray_session, small):
    """Per-row span-sequence equality (kind, text, media_ref, order) —
    the engine never mutates doc rows; validated docs read back from the
    source equal the input (BASELINE.json input_hint invariant)."""
    import ray.data as rd

    cfg, table, _, _ = small
    ds = rd.from_arrow(table)
    round_trip = pa.concat_tables(
        [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
         for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)]
    ).combine_chunks()
    assert round_trip.sort_by("doc_id").equals(table.sort_by("doc_id"))


def test_edge_empty_table(ray_session):
    import ray.data as rd

    empty = docs_table(GenConfig(n_docs=0))
    res = validate(DatasetSource(rd.from_arrow(empty)))
    assert res.violation_count() == 0
    assert res.overall_pass()


def test_edge_zero_and_null_spans(ray_session):
    """Docs with spans == [] or spans == null yield no span violations."""
    import ray.data as rd

    table = pa.table({
        "doc_id": pa.array(["a", "b"]),
        "spans": pa.array([[], None],
                          type=pa.list_(pa.struct([
                              ("kind", pa.string()), ("text", pa.string()),
                              ("media_ref", pa.string()), ("offset", pa.int32())]))),
    })
    res = validate(DatasetSource(rd.from_arrow(table)))
    assert res.violation_count() == 0


def test_ref_join_path_matches_broadcast(ray_session, small):
    """Large-catalog referential path (hash anti-join) must emit exactly
    the same violation set as the broadcast is_in path."""
    import ray.data as rd

    cfg, table, cat, expected = small
    from jsonschema_ray.sources.synth import catalog_table

    cat_ds = DatasetSource(rd.from_arrow(catalog_table(cfg)))
    res = validate(DatasetSource(rd.from_arrow(table)), catalog_source=cat_ds)
    assert _key_set(res) == expected


def test_composite_key_uniqueness(ray_session):
    """unique rule with a multi-column key: duplicates of the (a, b)
    pair are flagged; same a with different b is fine."""
    import ray.data as rd

    from jsonschema_ray.pipelines.validate import uniqueness_violations
    from jsonschema_ray.sources.readers import DatasetSource

    t = pa.table({
        "a": pa.array(["x", "x", "x", "y", "y"]),
        "b": pa.array([1, 1, 2, 1, 2], type=pa.int64()),
    })
    v = uniqueness_violations(DatasetSource(rd.from_arrow(t)), ["a", "b"],
                              "pair_unique", "m", 8).to_pandas()
    assert v["doc_id"].tolist() == ["x\x1f1"]
    assert v["rule_id"].tolist() == ["pair_unique"]


def test_skewed_duplicate_key(ray_session):
    """The salting path: one hot doc_id duplicated many times must come
    back as exactly ONE violation row, not hot-key × blocks rows."""
    cfg = GenConfig(n_docs=2000, clean=True, skew_hot_docs=500)
    res = validate(SynthSource(cfg, override_num_blocks=8),
                   catalog_keys=_catalog_keys(cfg))
    t = res.table()
    dup_rows = t.filter(pc.equal(t.column("rule_id"), "doc_id_unique"))
    assert dup_rows.num_rows == 1
    assert dup_rows.column("doc_id").to_pylist() == ["doc-hot"]


def test_ref_null_semantics_guarded_paths_agree(ray_session):
    """ADVICE r1: with a satisfied `when` guard, a NULL ref is a
    violation (it matches nothing in the catalog) — and the broadcast
    CatalogIndex path, the hash anti-join path, and the Python oracle
    must all agree on that."""
    import ray.data as rd

    from jsonschema_ray.spec.plan import CheckPlan, Rule

    span_t = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    table = pa.table({
        "doc_id": pa.array(["d0", "d1", "d2"]),
        "spans": pa.array([
            # media span with NULL ref → violation (guard satisfied)
            [{"kind": "media", "text": None, "media_ref": None, "offset": 0}],
            # media span with a good ref → ok
            [{"kind": "media", "text": None, "media_ref": "media://ok",
              "offset": 0}],
            # text span with NULL ref → guard unsatisfied, no violation
            [{"kind": "text", "text": "hi", "media_ref": None, "offset": 0}],
        ], type=span_t),
    })
    plan = CheckPlan(rules=[Rule(
        "ref_guarded", kind="ref", scope="span",
        when={"op": "eq", "field": "kind", "value": "media"},
        params={"field": "media_ref", "catalog_key": "media_ref"},
        message="guarded ref")])
    cat = pa.array(["media://ok"])
    cat_tbl = pa.table({"media_ref": cat})

    res_b = validate(DatasetSource(rd.from_arrow(table)), plan,
                     catalog_keys=cat)
    res_j = validate(DatasetSource(rd.from_arrow(table)), plan,
                     catalog_source=DatasetSource(rd.from_arrow(cat_tbl)))
    expected = oracle_violations(table.to_pylist(), plan,
                                 set(cat.to_pylist()))
    assert _key_set(res_b) == expected
    assert _key_set(res_j) == expected
    assert ("d0", "ref_guarded", 0) in expected


def test_resume_clears_stale_shard_output(ray_session, tmp_path):
    """ADVICE r1: a crash between write_parquet and commit_shard must
    not leave stale files that duplicate rows on resume."""
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.run import run_checkpointed
    from jsonschema_ray.state import manifest as mf

    cfg = GenConfig(n_docs=500, seed=3)
    p = str(tmp_path / "docs.parquet")
    pq.write_table(docs_table(cfg), p)
    out = str(tmp_path / "out")

    # simulate the crash: stale partial output in shard 0, NO manifest
    d = mf.shard_dir(out, 0)
    import os

    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(["stale"]), "rule_id": pa.array(["stale"]),
        "span_index": pa.array([0], type=pa.int32()),
        "message": pa.array(["stale"]),
        "part": pa.array([0], type=pa.int32())}), d + "/stale.parquet")

    summary = run_checkpointed([p], out, shard_size=1,
                               catalog_keys=_catalog_keys(cfg))
    assert summary["ran"] == 1
    import glob

    got = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(d + "/*.parquet")])
    assert "stale" not in set(got.column("rule_id").to_pylist())
    assert got.num_rows == summary["violations"]


def test_sorted_head_matches_sorted_table(ray_session, small):
    """The streaming report path (distributed sort + limit) must agree
    with the driver-concat path on content and order."""
    import ray.data as rd

    cfg, table, cat, expected = small
    res = validate(DatasetSource(rd.from_arrow(table)), catalog_keys=cat)
    full = res.sorted_table()
    head = res.sorted_head(37)
    assert head.num_rows == min(37, full.num_rows)
    assert head.to_pylist() == full.slice(0, 37).to_pylist()


def test_write_sorted_roundtrip(ray_session, small, tmp_path):
    import pyarrow.dataset as pads
    import ray.data as rd

    cfg, table, cat, expected = small
    res = validate(DatasetSource(rd.from_arrow(table)), catalog_keys=cat)
    out = str(tmp_path / "sorted_report")
    res.write_sorted(out)
    back = pads.dataset(out).to_table()
    assert back.num_rows == res.violation_count()


def test_ref_join_flat_table(ray_session):
    """spans_col=None flavour of the anti-join path: referential check
    on a TOP-LEVEL column of a flat table (no span structs), span_index
    emitted as -1 and doc_id cast to string."""
    import ray.data as rd

    from jsonschema_ray.pipelines.validate import referential_violations_join
    from jsonschema_ray.spec.plan import Rule

    rows = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_custkey": pa.array([10, 20, 30, None], type=pa.int64()),
    })
    cat = pa.table({"c_custkey": pa.array([10, 30], type=pa.int64())})
    rule = Rule("ref_flat", kind="ref",
                params={"field": "o_custkey", "catalog_key": "c_custkey"},
                message="missing custkey")
    out = referential_violations_join(
        DatasetSource(rd.from_arrow(rows)), rule,
        DatasetSource(rd.from_arrow(cat)), 4,
        doc_id_col="o_orderkey", spans_col=None).to_pandas()
    # null ref without a guard is skipped (matches broadcast semantics);
    # only custkey 20 is a genuine miss
    assert sorted(out["doc_id"].tolist()) == ["2"]
    assert out["span_index"].tolist() == [-1]
    assert out["rule_id"].tolist() == ["ref_flat"]


def test_bloom_ref_check_one_sided_guarantee(ray_session):
    """Bloom referential scale path: catalog members NEVER probe
    false, so every flagged row is a certain violation (zero false
    accusations); ≈fpp of true violations slip through — bounded
    here. The distributed OR-merge equals a single-pass build, and
    serialize/deserialize round-trips."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.functions.sketches import BloomFilter
    from jsonschema_ray.pipelines.validate import (bloom_ref_check,
                                                   build_catalog_bloom)
    from jsonschema_ray.sources.readers import DatasetSource

    catalog = np.array([f"media://{i:016x}" for i in range(200_000)],
                       dtype=object)
    cat_src = DatasetSource(
        rd.from_arrow(pa.table({"media_ref": catalog})).repartition(8))
    bf = build_catalog_bloom(cat_src, "media_ref", fpp=0.01,
                             batch_size=32_768)

    # distributed build ≡ local single-pass build (OR-merge exactness)
    local = BloomFilter(bf.n_bits, bf.k).add(catalog)
    assert np.array_equal(bf.bits, local.bits)
    rt = BloomFilter.deserialize(bf.serialize())
    assert rt.n_bits == bf.n_bits and np.array_equal(rt.bits, bf.bits)

    missing = np.array([f"media://BAD{i:013x}" for i in range(5_000)],
                       dtype=object)
    present = catalog[:: 40]                      # 5 000 known members
    probe = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(missing)
                                                   + len(present))]),
        "media_ref": pa.array(np.concatenate([missing, present])),
    })
    out = bloom_ref_check(
        DatasetSource(rd.from_arrow(probe).repartition(4)),
        "media_ref", bf, columns=["doc_id"]).to_pandas()
    flagged = set(out["media_ref"])
    assert flagged <= set(missing)     # zero false accusations, ever
    leaked = len(missing) - len(flagged)
    assert leaked / len(missing) < 0.03    # ≈ fpp=0.01, slack 3×
    assert len(flagged) > 0.97 * len(missing)
    # invert=True keeps probable members — exactly the complement
    kept = bloom_ref_check(
        DatasetSource(rd.from_arrow(probe).repartition(4)),
        "media_ref", bf, columns=["doc_id"], invert=True).to_pandas()
    assert len(kept) + len(out) == probe.num_rows
    assert set(present) <= set(kept["media_ref"])
