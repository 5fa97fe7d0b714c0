"""Deterministic hash split / sample (pipelines.sampling)."""
import numpy as np
import pyarrow as pa
import pytest


def _tbl(n=1000):
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": [f"doc {i}" for i in range(n)]})


def test_hash_split_deterministic_and_partitioned(ray_session):
    from jsonschema_ray.pipelines.sampling import hash_split

    a = hash_split(_tbl(), "doc_id").to_pandas().sort_values("doc_id")
    b = hash_split(_tbl(), "doc_id").to_pandas().sort_values("doc_id")
    assert a.equals(b)
    counts = a["split"].value_counts()
    # 80/10/10 within binomial slack
    assert 700 < counts["train"] < 880
    assert set(a["split"]) == {"train", "val", "test"}
    # buckets map to splits consistently
    assert (a.loc[a["bucket"] < 80, "split"] == "train").all()
    assert (a.loc[a["bucket"] >= 90, "split"] == "test").all()


def test_hash_split_stable_under_resharding(ray_session):
    """The same key gets the same split no matter how the corpus is
    sharded or what subset it arrives in (the anti-leak property)."""
    import ray.data as rd

    from jsonschema_ray.pipelines.sampling import hash_split
    from jsonschema_ray.sources.readers import DatasetSource

    full = hash_split(_tbl(1000), "doc_id").to_pandas()
    resharded = hash_split(
        DatasetSource(rd.from_arrow(_tbl(1000)).repartition(13)),
        "doc_id").to_pandas()
    subset = hash_split(_tbl(400), "doc_id").to_pandas()
    m_full = dict(zip(full["doc_id"], full["split"]))
    assert dict(zip(resharded["doc_id"], resharded["split"])) == m_full
    assert all(m_full[k] == v for k, v in
               zip(subset["doc_id"], subset["split"]))


def test_hash_split_rejects_bad_weights(ray_session):
    from jsonschema_ray.pipelines.sampling import hash_split

    with pytest.raises(ValueError):
        hash_split(_tbl(10), "doc_id", splits=(("a", 50), ("b", 40)))


def test_hash_sample_rate_and_determinism(ray_session):
    from jsonschema_ray.pipelines.sampling import hash_sample

    s1 = hash_sample(_tbl(5000), "doc_id", rate=0.2).to_pandas()
    s2 = hash_sample(_tbl(5000), "doc_id", rate=0.2).to_pandas()
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])
    assert 800 < len(s1) < 1200  # 0.2 * 5000 within slack
    # monotone: a 10% sample is a subset of the 20% sample
    s3 = hash_sample(_tbl(5000), "doc_id", rate=0.1).to_pandas()
    assert set(s3["doc_id"]) <= set(s1["doc_id"])


def test_stratified_hash_sample(ray_session):
    from jsonschema_ray.pipelines.sampling import (hash_sample,
                                                   stratified_hash_sample)

    langs = ["en", "fr", "de"]
    t = pa.table({"doc_id": pa.array(range(3000), pa.int64()),
                  "lang": [langs[i % 3] for i in range(3000)]})
    out = stratified_hash_sample(t, "doc_id", "lang",
                                 rates={"en": 0.5, "fr": 1.0},
                                 default_rate=0.1).to_pandas()
    counts = out["lang"].value_counts()
    assert counts["fr"] == 1000                 # rate 1.0 keeps all
    assert 400 < counts["en"] < 600             # ~0.5
    assert 50 < counts.get("de", 0) < 170       # default 0.1
    # per-stratum subset consistency with the flat sampler
    flat = hash_sample(t, "doc_id", rate=0.5).to_pandas()
    en = set(out.loc[out["lang"] == "en", "doc_id"])
    assert en == {d for d in flat["doc_id"] if d % 3 == 0}


def test_weighted_hash_sample_proportional_and_stable(ray_session):
    """Inclusion is a pure function of (key, weight): identical across
    block layouts, never keeps weight<=0/null rows, and the kept
    fraction grows ∝ weight (heavy rows ~9-11× the light rows at
    9:1 weight ratio over a large population)."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines.sampling import weighted_hash_sample
    from jsonschema_ray.sources.readers import DatasetSource

    n = 40000
    w = np.where(np.arange(n) % 2 == 0, 100, 900).astype(np.int64)
    w[0], w[2] = 0, -5
    wn = pa.array(
        [None if i == 4 else int(x) for i, x in enumerate(w)], pa.int64())
    t = pa.table({"k": pa.array([f"d{i}" for i in range(n)]), "w": wn})

    kept = {}
    for blocks in (1, 9):
        src = DatasetSource(rd.from_arrow(t).repartition(blocks))
        out = weighted_hash_sample(src, "k", "w", rate_per_unit=1 / 3000) \
            .to_pandas()
        kept[blocks] = set(out["k"])
    assert kept[1] == kept[9]
    out = kept[1]
    assert not ({"d0", "d2", "d4"} & out)
    light = sum(1 for k in out if int(k[1:]) % 2 == 0)
    heavy = len(out) - light
    # E[light] ≈ 20000/30 ≈ 667, E[heavy] ≈ 20000·0.3 = 6000
    assert 450 < light < 900 and 5400 < heavy < 6600
    ratio = (heavy / 20000) / (light / 20000)
    assert 7.0 < ratio < 11.5

    with pytest.raises(ValueError):
        weighted_hash_sample(DatasetSource(rd.from_arrow(t)), "k", "w",
                             rate_per_unit=0.0)


def test_rebalance_sources(ray_session):
    """Skewed strata are downsampled toward the smallest stratum:
    expected kept-count per stratum ≈ min_count, decisions are a pure
    function of the key (stable under repartition)."""
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines.sampling import rebalance_sources
    from jsonschema_ray.sources.readers import DatasetSource

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "src": pa.array([r[1] for r in rows], pa.string())})
    out = rebalance_sources(DatasetSource(rd.from_arrow(t)),
                            "doc_id", "src").to_pandas()
    kept = out.groupby("src")["doc_id"].count()
    assert kept["small"] == 100                    # ppm=1e6 keeps all
    assert 60 <= kept["big"] <= 140                # ≈100 expected
    assert (out[out.src == "small"]["rate_ppm"] == 1_000_000).all()
    assert (out[out.src == "big"]["rate_ppm"] == 111_111).all()
    # stability: different block layout → identical sample
    out2 = rebalance_sources(
        DatasetSource(rd.from_arrow(t).repartition(13)),
        "doc_id", "src").to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_temperature_mix_rates_and_determinism(ray_session):
    """α=0.5 flattening: keep-rate per stratum = min(1, scale/√n);
    small strata are kept whole at a high enough scale, big ones
    downsample; the rule is a pure function of the key (re-run
    identical), and null strata form their own sentinel stratum."""
    import numpy as np
    import pyarrow as pa
    import ray

    from jsonschema_ray.pipelines.sampling import temperature_mix
    from jsonschema_ray.sources.readers import DatasetSource

    n_big, n_small = 4000, 9
    t = pa.table({
        "k": pa.array(np.arange(n_big + n_small + 5, dtype=np.int64)),
        "s": pa.array(["big"] * n_big + ["small"] * n_small + [None] * 5),
    })

    def run():
        return temperature_mix(
            DatasetSource(ray.data.from_arrow(t).repartition(4)),
            key_col="k", strata_col="s", alpha=0.5, scale=4.0) \
            .to_pandas().sort_values("k").reset_index(drop=True)

    a, b = run(), run()
    assert a.equals(b)                       # re-run identical
    small = a[a["s"] == "small"]
    assert len(small) == n_small             # scale/√9 > 1 → kept whole
    assert (small["rate_q32"] == 1 << 32).all()
    big = a[a["s"] == "big"]
    exp_rate = 4.0 / np.sqrt(n_big)
    assert abs(len(big) / n_big - exp_rate) < 0.02
    nulls = a[a["s"].isnull()]
    assert len(nulls) == 5                   # 4/√5 > 1 → kept whole
