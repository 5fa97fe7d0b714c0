"""Checkpoint/resume: a killed run skips completed shards on resume."""

import glob

import pyarrow.parquet as pq

from jsonschema_ray.pipelines.run import run_checkpointed
from jsonschema_ray.sources.synth import GenConfig, catalog_table, gen_docs_batch
from jsonschema_ray.spec.plan import default_plan


def _write_shards(tmp_path, n_files=4, docs_per_file=200):
    import numpy as np

    cfg = GenConfig(n_docs=n_files * docs_per_file)
    paths = []
    for i in range(n_files):
        ids = np.arange(i * docs_per_file, (i + 1) * docs_per_file, dtype=np.uint64)
        p = tmp_path / f"docs-{i:03d}.parquet"
        pq.write_table(gen_docs_batch(ids, cfg), p)
        paths.append(str(p))
    cat = catalog_table(cfg).column("media_ref").combine_chunks()
    return cfg, paths, cat


def test_run_resume_skips_completed(tmp_path, ray_session):
    cfg, paths, cat = _write_shards(tmp_path)
    out = tmp_path / "out"

    # first run: only half the input (simulates a killed job)
    r1 = run_checkpointed(paths[:2], str(out), catalog_keys=cat, shard_size=1)
    assert r1["ran"] == 2 and r1["skipped"] == 0

    # resume over the full input: completed shards are skipped
    r2 = run_checkpointed(paths, str(out), catalog_keys=cat, shard_size=1)
    assert r2["skipped"] == 2 and r2["ran"] == 2
    assert r2["shards"] == 4
    assert r2["docs"] == 800
    assert not r2["passed"]  # fixture injects violations

    # violations written under shard dirs with manifests
    manifests = glob.glob(str(out / "shard=*" / "manifest.json"))
    assert len(manifests) == 4

    # third run: everything cached
    r3 = run_checkpointed(paths, str(out), catalog_keys=cat, shard_size=1)
    assert r3["ran"] == 0 and r3["skipped"] == 4
    assert r3["violations"] == r2["violations"]


def test_plan_change_invalidates(tmp_path, ray_session):
    cfg, paths, cat = _write_shards(tmp_path, n_files=2)
    out = tmp_path / "out"
    run_checkpointed(paths, str(out), catalog_keys=cat, shard_size=1)
    plan2 = default_plan().filtered(exclude=["kind_enum"])
    r = run_checkpointed(paths, str(out), plan2, catalog_keys=cat, shard_size=1)
    assert r["ran"] == 2 and r["skipped"] == 0  # new plan hash ⇒ recompute


def test_transform_checkpointed_resume(ray_session, tmp_path):
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.run import run_transform_checkpointed
    from jsonschema_ray.pipelines.textops import add_gopher_flags

    paths = []
    for s in range(3):
        t = pa.table({
            "doc_id": pa.array(np.arange(s * 10, s * 10 + 10), pa.int64()),
            "text": pa.array([f"the cat and dog have fun {i}" * 3
                              for i in range(10)])})
        p = str(tmp_path / f"in{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)

    out = str(tmp_path / "out")

    def gopher(src):
        return src.dataset(columns=["doc_id", "text"]).map_batches(
            lambda t: add_gopher_flags(t).drop_columns(["text"]),
            batch_format="pyarrow")

    r1 = run_transform_checkpointed(paths, out, gopher,
                                    fingerprint="gopher-v1", shard_size=1)
    assert r1 == {"shards": 3, "ran": 3, "skipped": 0, "rows": 30}
    # resume: nothing recomputes
    r2 = run_transform_checkpointed(paths, out, gopher,
                                    fingerprint="gopher-v1", shard_size=1)
    assert r2["ran"] == 0 and r2["skipped"] == 3 and r2["rows"] == 30
    # losing one _SUCCESS re-runs exactly that shard
    os.remove(os.path.join(out, "shard=00001", "_SUCCESS"))
    r3 = run_transform_checkpointed(paths, out, gopher,
                                    fingerprint="gopher-v1", shard_size=1)
    assert r3["ran"] == 1 and r3["skipped"] == 2
    # a changed fingerprint invalidates everything
    r4 = run_transform_checkpointed(paths, out, gopher,
                                    fingerprint="gopher-v2", shard_size=1)
    assert r4["ran"] == 3
    # the committed output is complete and readable
    import glob

    files = sorted(glob.glob(os.path.join(out, "shard=*", "*.parquet")))
    got = pa.concat_tables([pq.read_table(f) for f in files]) \
        .sort_by("doc_id")
    assert got.num_rows == 30
    assert got.column("n_words").to_pylist()[0] == 19
