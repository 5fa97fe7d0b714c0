"""stages/hashagg.py — the high-cardinality groupby replacement.

Equivalence contract: ``hash_group_agg(ds, keys, aggs)`` must return
exactly the rows a driver-side pandas groupby would (any row order),
for string and int keys, single and composite, and every supported
``how`` — including the dtypes (Ray's Sum/Min/Max preserve int64;
pandas must too on these paths). ``bucketed_map_groups`` must call the
kernel once per group with the full group frame, regardless of which
bucket the group hashes into.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from jsonschema_ray.stages.hashagg import bucketed_map_groups, hash_group_agg


def _collect(ds) -> pd.DataFrame:
    return ds.to_pandas()


def _rand_frame(seed: int, n: int = 5000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "ks": np.array([f"k{v}" for v in rng.integers(0, n // 3, n)],
                       dtype=object),
        "ki": rng.integers(-50, 50, n).astype(np.int64),
        "v": rng.integers(-1000, 1000, n).astype(np.int64),
        "f": rng.normal(size=n),
    })


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("keys", ["ks", "ki", ["ks", "ki"]])
def test_hash_group_agg_matches_pandas(ray_session, keys):
    df = _rand_frame(7)
    ds = rd.from_pandas([df.iloc[i:i + 1000] for i in range(0, len(df), 1000)])
    got = _collect(hash_group_agg(ds, keys, {
        "total": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max"),
        "n": ("v", "size"), "mean_f": ("f", "mean")}))
    key_list = [keys] if isinstance(keys, str) else keys
    want = (df.groupby(key_list, sort=False, as_index=False)
              .agg(total=("v", "sum"), lo=("v", "min"), hi=("v", "max"),
                   n=("v", "size"), mean_f=("f", "mean")))
    assert list(got.columns) == list(want.columns)
    g, w = _sorted(got), _sorted(want)
    for c in ("total", "lo", "hi", "n"):
        assert g[c].dtype == np.int64, (c, g[c].dtype)
    pd.testing.assert_frame_equal(g, w, check_exact=False, rtol=1e-12)


def test_hash_group_agg_high_cardinality_unique_keys(ray_session):
    # every row its own group — the regime where Ray's aggregate paid
    # ~ms/group; output must be the input (sum of a single row)
    n = 20_000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "v": np.arange(n, dtype=np.int64) * 3})
    ds = rd.from_pandas([df.iloc[i:i + 5000] for i in range(0, n, 5000)])
    got = _sorted(_collect(hash_group_agg(ds, "k", {"v": ("v", "sum")})))
    pd.testing.assert_frame_equal(got, _sorted(df))


def test_bucketed_map_groups_sees_whole_groups(ray_session):
    # kernel returns (key, rows_seen, checksum); every group must be
    # delivered intact exactly once
    df = _rand_frame(11, n=3000)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ks": [g["ks"].iloc[0]],
            "rows": [len(g)],
            "chk": [int(g["v"].sum())]})

    ds = rd.from_pandas([df.iloc[i:i + 700] for i in range(0, len(df), 700)])
    got = _sorted(_collect(bucketed_map_groups(ds, "ks", kernel)))
    want = _sorted(df.groupby("ks", as_index=False)
                   .agg(rows=("v", "size"), chk=("v", "sum"))
                   .rename(columns={}))
    want.columns = ["ks", "rows", "chk"]
    assert got["ks"].tolist() == want["ks"].tolist()
    assert got["rows"].astype(int).tolist() == want["rows"].astype(int).tolist()
    assert got["chk"].astype(int).tolist() == want["chk"].astype(int).tolist()
