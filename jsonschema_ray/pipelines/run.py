"""Checkpointed validation runner — the ``ray job submit`` entrypoint.

Shards the input, validates shard-by-shard (each shard is a full
distributed sub-pipeline), writes violations + manifest per shard, and
skips shards already committed under the same plan hash on resume
(state/manifest.py). The per-shard loop is driver-side control flow
only; all data work stays in Ray Data operators.
"""

from __future__ import annotations

import shutil
import time
from typing import Any, Sequence

from jsonschema_ray.pipelines.validate import validate
from jsonschema_ray.sources.readers import ParquetSource
from jsonschema_ray.spec.plan import CheckPlan, default_plan
from jsonschema_ray.state import manifest as mf


def run_checkpointed(
    input_paths: Sequence[str],
    out_dir: str,
    plan: CheckPlan | None = None,
    *,
    catalog_keys: Any = None,
    shard_size: int = 8,
    num_partitions: int = 64,
    concurrency: Any = None,
) -> dict[str, Any]:
    """Validate ``input_paths`` (parquet files) resumably into ``out_dir``.

    Returns run summary {shards, skipped, docs, violations, passed}.
    """
    plan = plan or default_plan()
    phash = plan.plan_hash()
    shards = mf.plan_shards(list(input_paths), shard_size)

    done = skipped = total_docs = total_violations = 0
    for i, files in enumerate(shards):
        if mf.is_complete(out_dir, i, phash):
            skipped += 1
            continue
        t0 = time.perf_counter()
        src = ParquetSource(files)
        res = validate(src, plan, catalog_keys=catalog_keys,
                       num_partitions=num_partitions, concurrency=concurrency)
        res.materialize()
        n_viol = res.violation_count()
        docs = src.dataset(columns=None).count()
        d = mf.shard_dir(out_dir, i)
        # An uncommitted shard dir may hold stale partials from a crash
        # between write_parquet and commit_shard; write_parquet appends,
        # so clear it first or readers would see duplicated rows.
        shutil.rmtree(d, ignore_errors=True)
        if n_viol:
            res.violations.write_parquet(d)
        mf.commit_shard(out_dir, mf.ShardManifest(
            shard=i, inputs=files, plan_hash=phash,
            docs=docs, violations=n_viol,
            wall_sec=round(time.perf_counter() - t0, 3)))
        done += 1
        total_docs += docs
        total_violations += n_viol

    # totals including previously-committed shards
    all_manifests = mf.load_manifests(out_dir)
    docs_all = sum(m["docs"] for m in all_manifests)
    viol_all = sum(m["violations"] for m in all_manifests)
    return {
        "shards": len(shards), "ran": done, "skipped": skipped,
        "docs": docs_all, "violations": viol_all,
        "passed": viol_all == 0, "plan_hash": phash,
    }


def run_transform_checkpointed(
    input_paths: Sequence[str],
    out_dir: str,
    transform,
    *,
    fingerprint: str,
    shard_size: int = 8,
) -> dict[str, Any]:
    """Resumable execution of ANY per-shard-independent transform —
    the map family (quality flags, token counts, normalization,
    redaction, chunking, Bloom scans / DSIR scoring against a FIXED
    broadcast model): ``transform(src: ParquetSource) -> Dataset``.

    Same manifest discipline as :func:`run_checkpointed`: each shard's
    output parquet lands in ``out/shard=<i>/`` with a lineage manifest
    (input files, ``fingerprint``, output row count, wall time) and a
    ``_SUCCESS`` marker written last; resume skips shards whose
    committed fingerprint matches. ``fingerprint`` must capture
    everything the output depends on (operator version + parameters +
    any broadcast model hash) — change it and every shard recomputes.

    Cross-shard operators (dedup joins, global groupbys) can't be
    sharded this way by definition; checkpoint their per-shard PARTIAL
    stage with this runner and re-run the small global merge.

    Returns {shards, ran, skipped, rows}."""
    shards = mf.plan_shards(list(input_paths), shard_size)
    done = skipped = 0
    for i, files in enumerate(shards):
        if mf.is_complete(out_dir, i, fingerprint):
            skipped += 1
            continue
        t0 = time.perf_counter()
        m = transform(ParquetSource(files)).materialize()
        rows = m.count()
        d = mf.shard_dir(out_dir, i)
        shutil.rmtree(d, ignore_errors=True)  # stale partials from a crash
        m.write_parquet(d)
        mf.commit_shard(out_dir, mf.ShardManifest(
            shard=i, inputs=files, plan_hash=fingerprint,
            docs=rows, violations=0,
            wall_sec=round(time.perf_counter() - t0, 3)))
        done += 1
    rows_all = sum(m["docs"] for m in mf.load_manifests(out_dir))
    return {"shards": len(shards), "ran": done, "skipped": skipped,
            "rows": rows_all}
