"""Time-sliced as-of join (hot-key mitigation): oracle-exact vs local
``pandas.merge_asof`` including a single entity owning 10^6 events, and
equivalent to the plain path on random multi-key corpora for all three
directions."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk_ds(df):
    import ray

    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _oracle(l, r, direction, how):
    l = l.sort_values("ts", kind="stable").reset_index(drop=True)
    r = r.sort_values("ts", kind="stable").reset_index(drop=True)
    rr = r.rename(columns={c: c + "_r" for c in r.columns})
    out = pd.merge_asof(l, rr, left_on="ts", right_on="ts_r",
                        left_by="k", right_by="k_r", direction=direction)
    if how == "inner":
        out = out[out["ts_r"].notna()]
    return out


def _norm(df):
    # value-level comparison: the engine restores int dtypes on the
    # inner path where the local pandas oracle keeps float64
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype(float)
    return sorted(map(tuple, df.astype(str).itertuples(index=False)))


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_sliced_matches_oracle_random(ray_session, direction):
    from jsonschema_ray.pipelines.joins import asof_join

    rng = np.random.default_rng(42)
    nl, nr = 3000, 1000
    l = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], nl),
        "ts": rng.integers(0, 100000, nl).astype(np.int64),
        "lv": np.arange(nl, dtype=np.int64)})
    r = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "e"], nr),
        "ts": rng.integers(0, 100000, nr).astype(np.int64),
        "rv": np.arange(nr, dtype=np.int64)})
    # merge_asof requires unique positioning per (k, ts) candidate pick
    # to be deterministic — dedupe ties so oracle comparison is exact
    l = l.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    r = r.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)

    for how in ("left", "inner"):
        got = asof_join(_mk_ds(l), _mk_ds(r), by="k", on="ts",
                        left_columns=["k", "ts", "lv"],
                        right_columns=["k", "ts", "rv"],
                        direction=direction, how=how,
                        num_partitions=4, time_slices=8).to_pandas()
        want = _oracle(l, r, direction, how)
        assert len(got) == len(want), (direction, how)
        assert _norm(got) == _norm(want), (direction, how)


def test_sliced_equals_plain(ray_session):
    from jsonschema_ray.pipelines.joins import asof_join

    rng = np.random.default_rng(7)
    l = pd.DataFrame({"k": rng.choice(["x", "y"], 500),
                      "ts": rng.integers(0, 1000, 500).astype(np.int64),
                      "lv": np.arange(500, dtype=np.int64)})
    r = pd.DataFrame({"k": rng.choice(["x", "y"], 200),
                      "ts": rng.integers(0, 1000, 200).astype(np.int64),
                      "rv": np.arange(200, dtype=np.int64)})
    l = l.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    r = r.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    kw = dict(by="k", on="ts", left_columns=["k", "ts", "lv"],
              right_columns=["k", "ts", "rv"], direction="backward",
              how="inner")
    plain = asof_join(_mk_ds(l), _mk_ds(r), **kw).to_pandas()
    sliced = asof_join(_mk_ds(l), _mk_ds(r), time_slices=6, **kw).to_pandas()
    assert _norm(plain) == _norm(sliced)


def test_hot_key_million_events(ray_session):
    """One bot entity owns 10^6 left events; slicing splits its merge
    into 32 time cells (~31k rows each) instead of one million-row
    pandas frame — and stays oracle-exact."""
    from jsonschema_ray.pipelines.joins import asof_join

    n = 1_000_000
    ts = np.arange(n, dtype=np.int64) * 3          # distinct, ordered
    l = pd.DataFrame({"k": np.repeat("bot", n), "ts": ts,
                      "lv": np.arange(n, dtype=np.int64)})
    rts = np.arange(0, n * 3, 1000, dtype=np.int64) + 1
    r = pd.DataFrame({"k": np.repeat("bot", len(rts)), "ts": rts,
                      "rv": np.arange(len(rts), dtype=np.int64)})

    got = asof_join(_mk_ds(l), _mk_ds(r), by="k", on="ts",
                    left_columns=["k", "ts", "lv"],
                    right_columns=["k", "ts", "rv"],
                    direction="backward", how="left",
                    num_partitions=4, time_slices=32).to_pandas()
    want = _oracle(l, r, "backward", "left")
    assert len(got) == n
    # spot-exact on a deterministic sample + full aggregate equality
    got_s = got.sort_values("lv").reset_index(drop=True)
    want_s = want.sort_values("lv").reset_index(drop=True)
    assert (got_s["rv_r"].fillna(-1) == want_s["rv_r"].fillna(-1)).all()
    assert (got_s["ts_r"].fillna(-1) == want_s["ts_r"].fillna(-1)).all()


def test_timestamp_axis_and_empty_right(ray_session):
    from jsonschema_ray.pipelines.joins import asof_join

    l = pd.DataFrame({"k": ["a", "a", "b"],
                      "ts": pd.to_datetime(["2020-01-01", "2020-06-01",
                                            "2020-03-01"]),
                      "lv": np.array([1, 2, 3], dtype=np.int64)})
    r = pd.DataFrame({"k": ["a", "b"],
                      "ts": pd.to_datetime(["2020-02-01", "2020-01-15"]),
                      "rv": np.array([10, 20], dtype=np.int64)})
    got = asof_join(_mk_ds(l), _mk_ds(r), by="k", on="ts",
                    left_columns=["k", "ts", "lv"],
                    right_columns=["k", "ts", "rv"],
                    direction="backward", how="left",
                    time_slices=4).to_pandas()
    want = _oracle(l, r, "backward", "left")
    assert _norm(got) == _norm(want)

    r_empty = r.iloc[:0]
    got2 = asof_join(_mk_ds(l), _mk_ds(r_empty), by="k", on="ts",
                     left_columns=["k", "ts", "lv"],
                     right_columns=["k", "ts", "rv"],
                     direction="backward", how="left",
                     time_slices=4).to_pandas()
    assert len(got2) == 3 and got2["rv_r"].isna().all()


def test_auto_probe_engages_slicing(ray_session, monkeypatch):
    """Round-5 verdict #5: the pathological entity is handled on the
    DEFAULT call path — no time_slices argument. A 600k-event single
    key (> AUTO_SLICE_ROWS) must (a) trip the probe into the sliced
    path and (b) stay oracle-exact."""
    import jsonschema_ray.pipelines.joins as J

    engaged = {}
    orig = J._asof_join_sliced

    def spy(*a, **kw):
        engaged["slices"] = kw.get("time_slices")
        return orig(*a, **kw)

    monkeypatch.setattr(J, "_asof_join_sliced", spy)

    n = 600_000
    l = pd.DataFrame({"k": np.repeat("bot", n),
                      "ts": (np.arange(n, dtype=np.int64) * 3) % 999_983,
                      "lv": np.arange(n, dtype=np.int64)})
    l = l.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    r = pd.DataFrame({"k": np.repeat("bot", 500),
                      "ts": np.arange(500, dtype=np.int64) * 1999,
                      "rv": np.arange(500, dtype=np.int64)})
    got = J.asof_join(_mk_ds(l), _mk_ds(r), by="k", on="ts",
                      left_columns=["k", "ts", "lv"],
                      right_columns=["k", "ts", "rv"],
                      direction="backward", how="inner",
                      num_partitions=4).to_pandas()
    assert engaged.get("slices", 0) >= 2
    want = _oracle(l, r, "backward", "inner")
    assert len(got) == len(want)
    assert _norm(got) == _norm(want)


def test_auto_probe_stays_plain_below_threshold(ray_session, monkeypatch):
    """Well-behaved keys keep the single-shuffle plain path: the probe
    must NOT engage slicing below AUTO_SLICE_ROWS."""
    import jsonschema_ray.pipelines.joins as J

    def boom(*a, **kw):  # plain path must never reach here
        raise AssertionError("sliced path engaged below threshold")

    monkeypatch.setattr(J, "_asof_join_sliced", boom)
    rng = np.random.default_rng(7)
    l = pd.DataFrame({"k": rng.choice(["a", "b"], 2000),
                      "ts": np.arange(2000, dtype=np.int64),
                      "lv": np.arange(2000, dtype=np.int64)})
    r = pd.DataFrame({"k": rng.choice(["a", "b"], 300),
                      "ts": np.arange(300, dtype=np.int64) * 7,
                      "rv": np.arange(300, dtype=np.int64)})
    got = J.asof_join(_mk_ds(l), _mk_ds(r), by="k", on="ts",
                      left_columns=["k", "ts", "lv"],
                      right_columns=["k", "ts", "rv"],
                      direction="backward", how="inner",
                      num_partitions=4).to_pandas()
    want = _oracle(l, r, "backward", "inner")
    assert len(got) == len(want)
    assert _norm(got) == _norm(want)
