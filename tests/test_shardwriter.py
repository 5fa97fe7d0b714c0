"""Shuffle-shard writer: layout determinism (hash-mod assignment,
(h, doc_id) intra-shard order, byte-identical re-runs), atomic-commit
resume semantics (committed shards never rewritten; fingerprint change
forces rewrite), and manifest exactness vs a driver recount."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.functions.sketches import md5_hash64
from jsonschema_ray.pipelines.shardwriter import shuffle_shard_write


def make_docs(n=150):
    texts = [f"tok{i % 7} tok{i % 3} word{i % 11}" for i in range(n)]
    texts[5] = None
    texts[6] = ""
    texts[7] = "   "
    return pa.table({"doc_id": [f"d{i:04d}" for i in range(n)],
                     "text": pa.array(texts, pa.string())})


def expected_layout(t, n_shards, seed):
    rows = []
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        h = int(md5_hash64(np.array([f"s{seed}|{doc_id}"],
                                    dtype=object))[0] >> np.uint64(1))
        ch = int(md5_hash64(np.array([text or ""], dtype=object))[0]
                 >> np.uint64(1))
        rows.append((h % n_shards, h, doc_id, ch,
                     len((text or "").split())))
    return rows


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "shards")


class TestLayout:
    def test_assignment_order_and_manifest(self, ray_session, out_dir):
        import ray.data as rd

        t = make_docs()
        m = shuffle_shard_write(rd.from_arrow(t).repartition(6), out_dir,
                                n_shards=4, seed=3).to_pandas() \
            .sort_values("shard").reset_index(drop=True)
        want = expected_layout(t, 4, 3)
        by_shard = {}
        for shard, h, doc_id, ch, nt in want:
            by_shard.setdefault(shard, []).append((h, doc_id, ch, nt))
        assert sorted(m["shard"]) == sorted(by_shard)
        for _, r in m.iterrows():
            rows = by_shard[r["shard"]]
            assert r["n_docs"] == len(rows)
            assert r["n_tokens"] == sum(nt for _, _, _, nt in rows)
            fp = 0
            for _, _, ch, _ in rows:
                fp ^= ch
            assert r["fp_xor"] == fp
            # file exists, sorted by (h, doc_id)
            f = os.path.join(out_dir, f"shard={r['shard']:05d}",
                             "part.parquet")
            got = pq.read_table(f)
            want_ids = [d for _, d, _, _ in sorted(rows)]
            assert got.column("doc_id").to_pylist() == want_ids

    def test_rerun_identical_bytes(self, ray_session, tmp_path):
        import ray.data as rd

        t = make_docs()
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        shuffle_shard_write(rd.from_arrow(t).repartition(3), a,
                            n_shards=4, seed=3).materialize()
        shuffle_shard_write(rd.from_arrow(t).repartition(9), b,
                            n_shards=4, seed=3).materialize()
        for fa in sorted(glob.glob(a + "/shard=*/part.parquet")):
            fb = fa.replace(a, b)
            assert open(fa, "rb").read() == open(fb, "rb").read(), fa

    def test_seed_changes_layout(self, ray_session, tmp_path):
        import ray.data as rd

        t = make_docs()
        m1 = shuffle_shard_write(rd.from_arrow(t),
                                 str(tmp_path / "s1"), 4, seed=1) \
            .to_pandas().sort_values("shard").reset_index(drop=True)
        m2 = shuffle_shard_write(rd.from_arrow(t),
                                 str(tmp_path / "s2"), 4, seed=2) \
            .to_pandas().sort_values("shard").reset_index(drop=True)
        assert not m1.equals(m2)
        assert m1["n_docs"].sum() == m2["n_docs"].sum()


class TestResume:
    def test_committed_shards_not_rewritten(self, ray_session, out_dir):
        import ray.data as rd

        t = make_docs()
        m1 = shuffle_shard_write(rd.from_arrow(t), out_dir, 4, seed=3) \
            .to_pandas().sort_values("shard").reset_index(drop=True)
        files = sorted(glob.glob(out_dir + "/shard=*/part.parquet"))
        stamps = {f: os.path.getmtime(f) for f in files}
        m2 = shuffle_shard_write(rd.from_arrow(t), out_dir, 4, seed=3) \
            .to_pandas().sort_values("shard").reset_index(drop=True)
        assert m1.equals(m2)
        assert {f: os.path.getmtime(f) for f in files} == stamps

    def test_partial_crash_recovers(self, ray_session, out_dir):
        import ray.data as rd

        t = make_docs()
        shuffle_shard_write(rd.from_arrow(t), out_dir, 4, seed=3) \
            .materialize()
        # simulate a crash that lost one shard's data AND marker
        victim = sorted(glob.glob(out_dir + "/shard=*"))[1]
        os.remove(os.path.join(victim, "_SUCCESS"))
        os.remove(os.path.join(victim, "part.parquet"))
        m = shuffle_shard_write(rd.from_arrow(t), out_dir, 4, seed=3) \
            .to_pandas()
        assert os.path.exists(os.path.join(victim, "part.parquet"))
        assert os.path.exists(os.path.join(victim, "_SUCCESS"))
        assert len(m) == 4

    def test_param_change_rewrites(self, ray_session, out_dir):
        import ray.data as rd

        t = make_docs()
        shuffle_shard_write(rd.from_arrow(t), out_dir, 4, seed=3) \
            .materialize()
        f = sorted(glob.glob(out_dir + "/shard=*/part.parquet"))[0]
        before = os.path.getmtime(f)
        # different key column naming contract → different fingerprint
        t2 = make_docs().rename_columns(["doc_id", "body"])
        shuffle_shard_write(rd.from_arrow(t2), out_dir, 4, seed=3,
                            text_col="body").materialize()
        assert os.path.getmtime(f) != before
