"""asof_join / broadcast_interval_join vs independent pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsonschema_ray.pipelines.joins import asof_join, broadcast_interval_join


def _mk_events(n=400, seed=7):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us")
    ts = base + rng.integers(0, 10**9, n).astype("timedelta64[us]")
    return pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "uid": rng.integers(0, 12, n).astype(np.int64),
        "ts": ts,
    })


def _ds(df):
    import ray

    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_join_matches_pandas(ray_session, how):
    left = _mk_events(300, seed=1)
    right = _mk_events(250, seed=2)

    out = asof_join(_ds(left), _ds(right), by="uid", on="ts",
                    left_columns=["eid", "uid", "ts"],
                    right_columns=["eid", "uid", "ts"],
                    how=how, num_partitions=5).to_pandas()

    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(
            columns={"eid": "eid_r", "uid": "uid_r", "ts": "ts_r"}),
        left_on="ts", right_on="ts_r", left_by="uid", right_by="uid_r",
        direction="backward")
    if how == "inner":
        exp = exp[exp["ts_r"].notna()].copy()
        for c in ("eid_r", "uid_r"):
            exp[c] = exp[c].astype(np.int64)

    key = ["eid"]
    out = out.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)[out.columns]
    pd.testing.assert_frame_equal(out, exp, check_like=True)


def test_asof_join_forward_direction(ray_session):
    left = _mk_events(100, seed=3)
    right = _mk_events(80, seed=4)
    out = asof_join(_ds(left), _ds(right), by="uid", on="ts",
                    left_columns=["eid", "uid", "ts"],
                    right_columns=["eid", "uid", "ts"],
                    how="inner", direction="forward",
                    num_partitions=3).to_pandas()
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(
            columns={"eid": "eid_r", "uid": "uid_r", "ts": "ts_r"}),
        left_on="ts", right_on="ts_r", left_by="uid", right_by="uid_r",
        direction="forward")
    exp = exp[exp["ts_r"].notna()]
    assert len(out) == len(exp)
    assert set(zip(out.eid, out.eid_r)) == set(zip(exp.eid, exp.eid_r))
    # forward: matched right timestamp is never before the left one
    assert (out.ts_r >= out.ts).all()


def test_asof_join_hot_key(ray_session):
    """Skew shape: one key holding most rows still merges correctly —
    the partitioning assumption is per-KEY group fit, and a hot key
    lands whole in one partition (documented in pipelines/joins.py)."""
    rng = np.random.default_rng(11)
    n = 20_000
    base = np.datetime64("2024-01-01", "us")
    left = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "uid": np.where(np.arange(n) % 50 == 0,
                        np.arange(n, dtype=np.int64) % 7, 0),  # ~98% uid=0
        "ts": base + rng.integers(0, 10**10, n).astype("timedelta64[us]"),
    })
    right = left.sample(frac=0.3, random_state=3).reset_index(drop=True)
    right["eid"] = right["eid"] + 10**6

    out = asof_join(_ds(left), _ds(right), by="uid", on="ts",
                    left_columns=["eid", "uid", "ts"],
                    right_columns=["eid", "uid", "ts"],
                    how="inner", num_partitions=8).to_pandas()
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(
            columns={"eid": "eid_r", "uid": "uid_r", "ts": "ts_r"}),
        left_on="ts", right_on="ts_r", left_by="uid", right_by="uid_r",
        direction="backward")
    exp = exp[exp["ts_r"].notna()]
    assert len(out) == len(exp)
    assert set(zip(out.eid, out.eid_r)) == set(zip(exp.eid, exp.eid_r))


def test_interval_join_overlapping_windows(ray_session):
    ev = _mk_events(500, seed=5)
    base = np.datetime64("2024-01-01", "us")
    starts = base + np.array([0, 200, 350], dtype="timedelta64[s]") * 10**6
    ends = starts + np.array([300, 300, 900], dtype="timedelta64[s]") * 10**6
    win = pa.table({"window_id": pa.array([10, 20, 30], type=pa.int64()),
                    "start": pa.array(starts.astype("datetime64[us]")),
                    "end": pa.array(ends.astype("datetime64[us]"))})

    out = broadcast_interval_join(_ds(ev), win, time_col="ts",
                                  columns=["ts", "eid"]).to_pandas()

    rows = []
    for wid, s, e in zip([10, 20, 30], starts, ends):
        m = (ev.ts.values >= s) & (ev.ts.values <= e)
        for eid in ev.eid.values[m]:
            rows.append((wid, eid))
    assert sorted(zip(out.window_id, out.eid)) == sorted(rows)
    # overlap emits one row per containing window
    assert len(out) >= out.eid.nunique()


def test_interval_join_no_matches_keeps_schema(ray_session):
    ev = _mk_events(50, seed=6)
    far = np.datetime64("2030-01-01", "us")
    win = pa.table({"window_id": pa.array([1], type=pa.int64()),
                    "start": pa.array([far]),
                    "end": pa.array([far + np.timedelta64(1, "h")])})
    ds = broadcast_interval_join(_ds(ev), win, time_col="ts",
                                 columns=["ts", "eid"])
    assert ds.count() == 0
    assert ds.schema().names == ["window_id", "ts", "eid"]


def test_hash_join_sparse_keys_and_dtypes(ray_session):
    # sparse keys (2 distinct) across many partitions — the regime
    # where Ray's native Dataset.join finalize crashes on schema-less
    # empty partitions (joins.hash_join docstring)
    import pandas as pd
    import ray.data as rd

    from jsonschema_ray.pipelines.joins import hash_join

    left = pd.DataFrame({"k": [1, 1, 2, 2, 2, 99],
                         "v": np.arange(6, dtype=np.int64)})
    right = pd.DataFrame({"rk": [1, 2, 3],
                          "w": np.array([10, 20, 30], dtype=np.int64)})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", right_on="rk", num_partitions=16).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk")[["k", "v", "w"]]
    got = out.sort_values(["k", "v"]).reset_index(drop=True)
    assert list(out.columns) == ["k", "v", "w"]
    assert got.equals(want.sort_values(["k", "v"]).reset_index(drop=True))
    assert all(str(out[c].dtype) == "int64" for c in out.columns)


def test_hash_join_one_side_empty(ray_session):
    import pandas as pd
    import ray.data as rd

    from jsonschema_ray.pipelines.joins import hash_join

    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                         "v": np.arange(10, dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([], dtype=np.int64),
                          "w": np.array([], dtype=np.int64)})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", num_partitions=8).to_pandas()
    assert len(out) == 0


def test_hash_join_left_nullable_ints(ray_session):
    import pandas as pd
    import ray.data as rd

    from jsonschema_ray.pipelines.joins import hash_join

    left = pd.DataFrame({"k": np.array([1, 2, 3], np.int64),
                         "v": np.array([10, 20, 30], np.int64)})
    right = pd.DataFrame({"k": np.array([1], np.int64),
                          "w": np.array([7], np.int64)})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", how="left", num_partitions=4)
    import pyarrow as pa

    tab = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")])
    t = tab.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(t) == 3
    assert t.loc[0, "w"] == 7
    assert pd.isna(t.loc[1, "w"]) and pd.isna(t.loc[2, "w"])
    # the BLOCKS are Arrow int64-with-nulls — never float64 or a
    # null-typed column (the pandas VIEW of int64+null renders as
    # float64 by pandas semantics; the engine consumes blocks)
    assert tab.schema.field("w").type == pa.int64()


def test_hash_join_matches_pyarrow_join_random(ray_session):
    # property check: hash_join == single-node Arrow join on random
    # key multisets (duplicates on both sides → cross products)
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines.joins import hash_join

    rng = np.random.default_rng(7)
    for trial in range(3):
        left = pd.DataFrame({
            "k": rng.integers(0, 30, 200).astype(np.int64),
            "v": np.arange(200, dtype=np.int64)})
        right = pd.DataFrame({
            "rk": rng.integers(0, 30, 50).astype(np.int64),
            "w": np.arange(50, dtype=np.int64) * 10})
        got = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", right_on="rk",
                        num_partitions=7).to_pandas()
        want = pa.Table.from_pandas(left).join(
            pa.Table.from_pandas(right), keys=["k"], right_keys=["rk"],
            join_type="inner").to_pandas()
        key = ["k", "v", "w"]
        g = got[key].sort_values(key).reset_index(drop=True)
        w = want[key].sort_values(key).reset_index(drop=True)
        assert g.equals(w), trial
