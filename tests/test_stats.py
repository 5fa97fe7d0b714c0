"""Sketches + column-profile pipeline + drift checks."""

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray.functions.sketches import HyperLogLog, TDigest, hash64, quantile_drift


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 60, size=200_000).astype(np.uint64)
    true = len(np.unique(vals))
    h = HyperLogLog()
    h.add_hashes(hash64(vals))
    est = h.estimate()
    assert abs(est - true) / true < 0.05

    # mergeability: two halves == whole
    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.add_hashes(hash64(vals[:100_000]))
    h2.add_hashes(hash64(vals[100_000:]))
    merged = h1.merge(h2)
    assert merged.estimate() == pytest.approx(est)
    # serialization round-trip
    assert HyperLogLog.deserialize(merged.serialize()).estimate() == merged.estimate()


def test_hll_small_cardinality_linear_counting():
    h = HyperLogLog()
    vals = np.arange(100, dtype=np.uint64)
    h.add_hashes(hash64(vals))
    assert abs(h.estimate() - 100) < 5


def test_tdigest_quantiles():
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1, size=100_000)
    td = TDigest()
    for chunk in np.array_split(vals, 10):  # batched adds, like per-block partials
        td.add(chunk)
    for p, want in [(0.5, 0.0), (0.1, -1.2816), (0.9, 1.2816)]:
        assert td.quantile(p)[0] == pytest.approx(want, abs=0.05)
    assert td.count == pytest.approx(100_000)
    # merge two digests == one
    a, b = TDigest(), TDigest()
    a.add(vals[:50_000]); b.add(vals[50_000:])
    m = a.merge(b)
    assert m.quantile(0.5)[0] == pytest.approx(td.quantile(0.5)[0], abs=0.05)
    rt = TDigest.deserialize(m.serialize())
    assert rt.quantile(0.9)[0] == m.quantile(0.9)[0]


def test_quantile_drift_detects_shift():
    rng = np.random.default_rng(5)
    base, same, shifted = TDigest(), TDigest(), TDigest()
    base.add(rng.normal(0, 1, 50_000))
    same.add(rng.normal(0, 1, 50_000))
    shifted.add(rng.normal(0.8, 1, 50_000))
    assert quantile_drift(base, same) < 0.05
    assert quantile_drift(base, shifted) > 0.1


def test_profile_pipeline(ray_session):
    import ray.data as rd

    from jsonschema_ray.pipelines.stats import ProfileSpec, check_drift, check_stats, profile
    from jsonschema_ray.sources.readers import DatasetSource
    from jsonschema_ray.sources.synth import GenConfig, docs_table

    cfg = GenConfig(n_docs=2000, clean=True)
    table = docs_table(cfg)
    src = DatasetSource(rd.from_arrow(table))
    out = profile(src, [
        ProfileSpec(column="doc_id", hll=True),
        ProfileSpec(column="spans.offset", hll=False, tdigest=True),
        ProfileSpec(column="spans.kind", hll=True),
    ])
    # exact stats vs direct computation
    assert out["doc_id"]["count"] == 2000
    assert out["doc_id"]["nulls"] == 0
    assert abs(out["doc_id"]["distinct_est"] - 2000) / 2000 < 0.05
    assert out["spans.kind"]["distinct_est"] == pytest.approx(4, abs=1)

    import pyarrow.compute as pc
    flat = pc.list_flatten(table.column("spans").combine_chunks())
    offsets = flat.field("offset")
    assert out["spans.offset"]["min"] == pc.min(offsets).as_py()
    assert out["spans.offset"]["max"] == pc.max(offsets).as_py()
    assert out["spans.offset"]["count"] == len(offsets)

    # stats bounds rule
    v = check_stats(out, [{"column": "doc_id", "max_null_rate": 0.0},
                          {"column": "spans.offset", "min_value": 0}])
    assert v == []
    v = check_stats(out, [{"column": "spans.kind", "distinct_max": 2}])
    assert len(v) == 1 and v[0]["rule_id"] == "stats_bounds"

    # drift: same distribution passes, shifted fails
    out2 = profile(DatasetSource(rd.from_arrow(docs_table(
        GenConfig(n_docs=2000, clean=True, seed=99)))),
        [ProfileSpec(column="spans.offset", hll=False, tdigest=True)])
    assert check_drift(out2, {"spans.offset": out["spans.offset"]}, tolerance=0.1) == []


def test_profile_partial_roundtrip_via_parquet(tmp_path, ray_session):
    """Profile over a parquet source with pruned read."""
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.stats import ProfileSpec, profile
    from jsonschema_ray.sources.readers import ParquetSource
    from jsonschema_ray.sources.synth import GenConfig, docs_table

    p = tmp_path / "docs.parquet"
    pq.write_table(docs_table(GenConfig(n_docs=500, clean=True)), p)
    out = profile(ParquetSource(str(p)), [ProfileSpec(column="doc_id")])
    assert out["doc_id"]["count"] == 500


def test_hll_md5_registers_block_invariant(ray_session):
    """ProfileSpec(hash_fn='md5'): registers are a pure function of the
    value SET — identical across block layouts, and equal to a
    single-shot local HLL (the property the SQL oracle relies on)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.functions.sketches import HyperLogLog, md5_hash64
    from jsonschema_ray.pipelines.stats import ProfileSpec, profile
    from jsonschema_ray.sources.readers import DatasetSource

    vals = [f"v{i % 700}" for i in range(5000)]  # dups across blocks
    t = pa.table({"doc_id": pa.array(range(5000), pa.int64()),
                  "x": vals})
    regs = []
    for blocks in (1, 7):
        src = DatasetSource(rd.from_arrow(t).repartition(blocks))
        p = profile(src, [ProfileSpec(column="x", hll=True,
                                      hash_fn="md5")])["x"]
        regs.append(HyperLogLog.deserialize(bytes.fromhex(p["hll"]))
                    .registers)
    local = HyperLogLog()
    local.add_hashes(md5_hash64(np.array(vals, dtype=object)))
    assert np.array_equal(regs[0], regs[1])
    assert np.array_equal(regs[0], local.registers)


def _disc_rank(q, n):
    return min(max(int(np.ceil(q * n)) - 1, 0), n - 1)


def test_exact_quantiles_matches_duckdb_and_numpy(ray_session):
    """Distributed histogram-narrowing selection returns the SAME
    element DuckDB quantile_disc and driver-side numpy selection
    return — bit-exact, across dup-heavy / constant / int / null /
    tiny inputs, and regardless of block split."""
    import duckdb
    import ray.data as rd

    from jsonschema_ray.pipelines.stats import exact_quantiles
    from jsonschema_ray.sources.readers import DatasetSource

    rng = np.random.default_rng(17)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    cases = {
        "uniform": rng.uniform(-1e6, 1e6, 30011),
        "dup_heavy": rng.choice([1.5, 2.5, 2.5, 9.0, -3.25], 20000),
        "constant": np.full(5000, 42.0),
        "two_adjacent_floats": rng.choice(
            [1.0, np.nextafter(1.0, 2.0)], 9999),
        "ints": rng.integers(-50, 50, 7001).astype(np.int64),
        "tiny": np.array([3.0]),
        "with_nulls": None,
    }
    for name, data in cases.items():
        if name == "with_nulls":
            col = pa.array([1.0, None, 5.0, None, 2.0, 4.0, 3.0])
            clean = np.array([1.0, 5.0, 2.0, 4.0, 3.0])
        else:
            col = pa.array(data)
            clean = np.asarray(data, dtype=np.float64)
        t = pa.table({"x": col})
        src = DatasetSource(rd.from_arrow(t).repartition(6))
        # small caps force the histogram rounds to actually iterate
        out = exact_quantiles(src, "x", qs, bins=16, collect_cap=64)
        got = dict(zip(out.column("q").to_pylist(),
                       out.column("value").to_pylist()))
        s = np.sort(clean)
        for q in qs:
            want = float(s[_disc_rank(q, len(s))])
            assert got[q] == want, (name, q, got[q], want)
        ora = duckdb.sql(
            f"SELECT unnest(quantile_disc(x, {qs!r})) FROM t").fetchall()
        for q, (v,) in zip(qs, ora):
            assert got[q] == float(v), (name, "duckdb", q)


def test_exact_quantiles_empty(ray_session):
    import ray.data as rd

    from jsonschema_ray.pipelines.stats import exact_quantiles
    from jsonschema_ray.sources.readers import DatasetSource

    t = pa.table({"x": pa.array([], pa.float64())})
    out = exact_quantiles(DatasetSource(rd.from_arrow(t)), "x", [0.5])
    assert out.column("value").to_pylist() == [None]


def test_exact_quantiles_by_group_matches_duckdb(ray_session):
    """Per-group selection: same machinery, intervals keyed by
    (group, q); matches DuckDB quantile_disc ... GROUP BY bit-exactly
    including single-row groups and a group with nulls only."""
    import duckdb
    import ray.data as rd

    from jsonschema_ray.pipelines.stats import exact_quantiles_by
    from jsonschema_ray.sources.readers import DatasetSource

    rng = np.random.default_rng(5)
    n = 12000
    keys = rng.choice(["a", "b", "c", "dd"], n).tolist() + ["solo", "nullg"]
    vals = rng.normal(0, 1000, n).tolist() + [77.5, None]
    t = pa.table({"g": pa.array(keys), "x": pa.array(vals, pa.float64())})
    qs = [0.1, 0.5, 0.9]
    out = exact_quantiles_by(
        DatasetSource(rd.from_arrow(t).repartition(5)), "g", "x", qs,
        bins=32, collect_cap=128)
    got = {(k, q): v for k, q, v in zip(out.column("g").to_pylist(),
                                        out.column("q").to_pylist(),
                                        out.column("value").to_pylist())}
    ora = duckdb.sql(
        f"SELECT g, unnest({qs!r}) AS q, "
        f"unnest(quantile_disc(x, {qs!r})) AS v FROM t "
        "WHERE x IS NOT NULL GROUP BY g").fetchall()
    assert len(got) == len(ora)          # nullg absent on both sides
    for g, q, v in ora:
        assert got[(g, float(q))] == float(v), (g, q)
    with pytest.raises(ValueError):
        exact_quantiles_by(DatasetSource(rd.from_arrow(t)), "g", "x", qs,
                           max_groups=2)


def test_psi_drift_planted(ray_session):
    """Cohorts drawn from different ranges produce a large PSI; equal
    cohorts produce ~0."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines.stats import psi_drift
    from jsonschema_ray.sources.readers import DatasetSource

    n = 2000
    # even ids: value in [0, 1); odd ids: value in [9, 10) → max drift
    ids = list(range(n))
    vals = [(i % 10) / 10.0 if i % 2 == 0 else 9.0 + (i % 10) / 10.0
            for i in ids]
    t = pa.table({"event_id": pa.array(ids, pa.int64()),
                  "value": pa.array(vals, pa.float64())})
    out = psi_drift(DatasetSource(rd.from_arrow(t)), "value", "event_id")
    assert out.num_rows == 10
    total = sum(out.column("psi_q").to_pylist()) / 1e6
    assert total > 2.0           # canonical "major shift" is only 0.2
    # identical cohorts → PSI ≈ 0 (ln(1)=0 everywhere)
    t2 = pa.table({"event_id": pa.array(ids, pa.int64()),
                   "value": pa.array([float(i % 7) for i in ids])})
    out2 = psi_drift(DatasetSource(rd.from_arrow(t2)), "value", "event_id")
    tot2 = sum(abs(x) for x in out2.column("psi_q").to_pylist()) / 1e6
    assert tot2 < 0.02


def test_ks_drift_exact(ray_session):
    """KS on a planted case equals the hand-computed statistic and
    matches a brute-force ECDF evaluation."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines.stats import ks_drift
    from jsonschema_ray.sources.readers import DatasetSource

    rng = np.random.default_rng(7)
    nb_, nc_ = 400, 600
    a = rng.normal(0.0, 1.0, nb_)            # baseline cohort
    b = rng.normal(0.7, 1.2, nc_)            # shifted cohort
    ids = np.r_[np.arange(nb_) * 2, np.arange(nc_) * 2 + 1]
    vals = np.r_[a, b]
    t = pa.table({"event_id": pa.array(ids, pa.int64()),
                  "value": pa.array(vals, pa.float64())})
    out = ks_drift(DatasetSource(rd.from_arrow(t).repartition(7)),
                   "value", "event_id")
    row = {c: out.column(c).to_pylist()[0] for c in out.schema.names}
    assert (row["nb"], row["nc"]) == (nb_, nc_)
    # brute force: exact integer ECDF gap over distinct values
    vs = np.unique(vals)
    cb = np.searchsorted(np.sort(a), vs, side="right")
    cc = np.searchsorted(np.sort(b), vs, side="right")
    expect = int(np.max(np.abs(cb.astype(object) * nc_
                               - cc.astype(object) * nb_)))
    assert row["ks_num"] == expect
    assert row["ks_q"] == int(np.floor(1e6 * (expect / (nb_ * nc_)) + 0.5))


def test_zscore_outliers_planted(ray_session):
    """A planted extreme value is flagged with the right sign; in-band
    values are not; null group/value rows never appear."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines.stats import zscore_outliers
    from jsonschema_ray.sources.readers import DatasetSource

    vals = [10.0 + (i % 5) / 10.0 for i in range(100)] + [99.0, None]
    grps = ["a"] * 101 + [None]
    ids = list(range(102))
    t = pa.table({"event_id": pa.array(ids, pa.int64()),
                  "event_type": pa.array(grps, pa.string()),
                  "value": pa.array(vals, pa.float64())})
    out = zscore_outliers(DatasetSource(rd.from_arrow(t)), "value",
                          "event_type", threshold=2.0,
                          id_col="event_id").to_pandas()
    assert out["event_id"].tolist() == [100]      # only the planted spike
    assert out["z_q"].iloc[0] > 20000             # z >> 2 quantized 1e4
