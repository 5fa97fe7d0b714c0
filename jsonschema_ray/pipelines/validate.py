"""The flagship pipeline: distributed validation of interleaved docs.

Ray-Data shape (SURVEY.md §3.1 "Ray shape" / §7.1):

  driver:   CheckPlan (compile is driver-cheap; plan is broadcast data)
  stage 1:  source → map_batches(ValidateBatch actor pool)   [row-local rules]
  stage 2:  source(doc_id only) → per-block partial counts →
            groupby(key) over (key, partial_count)           [uniqueness]
  stage 3:  union of violation datasets → (materialize | write_parquet)
  verdict:  any error-severity violation ⇒ fail (exit-code-2 analog,
            /root/reference/src/exit_code.h:6-11)

Stage 2 shuffles only a thin (key,count) table — never full docs; a hot
duplicated key is pre-collapsed to one row per block (salting by
construction). Referential checks run in stage 1 against a broadcast
catalog key set (``ray.put`` once, read per actor); a hash anti-join
path for catalogs too big to broadcast is planned (SURVEY.md §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsonschema_ray.sources.readers import DocSource, as_source
from jsonschema_ray.spec.compile import VIOLATION_SCHEMA
from jsonschema_ray.spec.plan import CheckPlan, default_plan
from jsonschema_ray.stages.validator import (
    VIOLATION_PART_SCHEMA,
    FastVerdictBatch,
    ValidateBatch,
    make_fast_verdict_fn,
    make_validate_fn,
    partition_of,
)

DEFAULT_BATCH_SIZE = 32768  # docs per batch — measured sweet spot: big
                            # enough that task dispatch (~50 tasks/s on
                            # this sandbox) never starves 32 workers,
                            # small enough that batch × concurrency fits
                            # worker heaps even for span-heavy rows


def _maybe_put(obj: Any) -> Any:
    """Broadcast the catalog membership index via the object store
    (built ONCE on the driver, ``ray.put`` once, every actor reads the
    same plasma copy) — falls through when Ray isn't up (pure-driver
    unit tests)."""
    import ray

    from jsonschema_ray.functions.catalog import CatalogIndex

    if obj is None:
        return None
    if not isinstance(obj, CatalogIndex):
        obj = CatalogIndex(obj)
    if not ray.is_initialized():
        return obj
    return ray.put(obj)


def _dup_violation_fn(rule_id: str, message: str, num_partitions: int):
    def to_violations(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return VIOLATION_PART_SCHEMA.empty_table()
        keys = t.column(t.column_names[0])
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        n = len(keys)
        part = partition_of(keys, num_partitions)
        return pa.Table.from_arrays(
            [
                keys,
                pa.array(np.full(n, rule_id, dtype=object), type=pa.string()),
                pa.array(np.full(n, -1, dtype=np.int32), type=pa.int32()),
                pa.array(np.full(n, message, dtype=object), type=pa.string()),
                pa.array(part, type=pa.int32()),
            ],
            schema=VIOLATION_PART_SCHEMA,
        )

    return to_violations


def uniqueness_violations(source: DocSource, key: str | list[str],
                          rule_id: str, message: str, num_partitions: int,
                          agg_partitions: int = 64):
    """Dataset-scope uniqueness: pruned read of the key column → per-block
    partial counts keyed by an int64 key hash → ``sort(hash)`` co-locates
    each key's partials → one vectorized Arrow ``group_by`` merge per
    sorted partition. Lazy, so it overlaps the row-local scan in the
    streaming executor.

    The hash-sort scheme shuffles the same thin (key, count) pairs but
    sorts only an int64 column — measured 2.75× faster than
    ``groupby(key).aggregate(Sum)`` whose sort-based shuffle orders all
    key strings (8.0s vs 22.0s on 2M keys, 32 cpus; Ray's HASH_SHUFFLE
    strategy was slower still — see BASELINE.md). The FULL hash (not
    hash % num_buckets) is the sort key: range boundaries sampled from
    a 64-value bucket column collide, and Ray pads the resulting empty
    sort partitions with schema-less blocks ("new schema: ." executor
    warnings); a high-cardinality key makes boundary ties — and the
    pads — vanish. Equal hashes never straddle a partition (Ray splits
    at boundary VALUES), so a per-partition merge is exact. Skewed
    duplicate keys are collapsed to one row per block BEFORE the
    shuffle, so a hot key costs one row per block, not its
    multiplicity.
    """
    key_cols = [key] if isinstance(key, str) else list(key)
    kname = key_cols[0] if len(key_cols) == 1 else "__ckey"

    def _key_array(batch: pa.Table) -> pa.Array:
        if len(key_cols) == 1:
            col = batch.column(key_cols[0])
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
        # composite key: components joined with an unlikely separator
        parts = []
        for c in key_cols:
            col = batch.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            parts.append(col.cast(pa.string()))
        return pc.binary_join_element_wise(*parts, "\x1f")

    from jsonschema_ray.functions.sketches import hash64

    def partials_bucketed(batch: pa.Table) -> pa.Table:
        vc = _key_array(batch).drop_null().value_counts()
        keys = vc.field("values")
        h = hash64(keys.to_numpy(zero_copy_only=False), seed=0)
        return pa.table({
            kname: keys,
            "partial_count": vc.field("counts").cast(pa.int64()),
            # int64 view: a uint64 column round-trips through Ray's
            # shuffle as a pickled extension array (see BASELINE.md)
            "__khash": pa.array(h.view(np.int64)),
        })

    def merge_sorted(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or kname not in t.column_names:
            # 0-row partition (boundary-tie pad): emit a typed empty
            return pa.table({kname: pa.array([], type=pa.string())})
        g = pa.TableGroupBy(t.select([kname, "partial_count"]),
                            kname).aggregate([("partial_count", "sum")])
        return g.filter(pc.greater(g.column("partial_count_sum"), 1)) \
            .select([kname])

    # coalesce the many small partial blocks before the sort:
    # hundreds of 16k-row blocks thrash the sort scheduler, which
    # schedules a map+reduce pair per block (measured 21.9s → 8.9s at
    # 8M keys with 32 coalesced blocks)
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    coalesce = max(8, min(agg_partitions, cpus))
    dups = source.dataset(columns=key_cols).map_batches(
        partials_bucketed, batch_format="pyarrow") \
        .repartition(coalesce) \
        .sort("__khash") \
        .map_batches(merge_sorted, batch_format="pyarrow", batch_size=None)
    return dups.map_batches(_dup_violation_fn(rule_id, message, num_partitions),
                            batch_format="pyarrow")


def _stats_drift_violations(src: DocSource, rules: list):
    """Evaluate ``stats`` / ``drift`` rules: one shared column profile
    (mergeable sketch partials — no data shuffle), bounds / baseline
    comparison on the driver, violations as a tiny from_arrow dataset.

    stats params: {column, max_null_rate?, min_value?, max_value?,
    distinct_min?, distinct_max?}. drift params: {column, baseline:
    per-column profile dict (state/profile.py), tolerance}.
    """
    import ray.data as rd

    from jsonschema_ray.pipelines.stats import (
        ProfileSpec, StatsBounds, check_drift, check_stats, profile)

    specs: dict[str, ProfileSpec] = {}
    for r in rules:
        col = r.params["column"]
        spec = specs.setdefault(col, ProfileSpec(column=col, hll=False))
        if r.kind == "stats" and (r.params.get("distinct_min") is not None
                                  or r.params.get("distinct_max") is not None):
            spec.hll = True
        if r.kind == "drift":
            spec.tdigest = True
    prof = profile(src, list(specs.values()))

    out_rows: list[dict] = []
    for r in rules:
        if r.kind == "stats":
            found = check_stats(prof, [StatsBounds(
                column=r.params["column"],
                max_null_rate=r.params.get("max_null_rate"),
                min_value=r.params.get("min_value"),
                max_value=r.params.get("max_value"),
                distinct_min=r.params.get("distinct_min"),
                distinct_max=r.params.get("distinct_max"))])
        else:
            found = check_drift(prof,
                                {r.params["column"]: r.params["baseline"]},
                                tolerance=r.params.get("tolerance", 0.1))
        for v in found:
            out_rows.append({"doc_id": v["doc_id"], "rule_id": r.rule_id,
                             "span_index": -1,
                             "message": r.message or v["message"], "part": 0})
    tbl = pa.Table.from_pylist(out_rows, schema=VIOLATION_PART_SCHEMA) \
        if out_rows else VIOLATION_PART_SCHEMA.empty_table()
    return rd.from_arrow(tbl)


def referential_violations_join(
    source: DocSource,
    rule: Any,
    catalog_source: DocSource,
    num_partitions: int,
    *,
    doc_id_col: str = "doc_id",
    spans_col: str | None = "spans",
    join_partitions: int | None = None,
):
    """Referential check via distributed hash anti-join — the path for
    catalogs too large to broadcast (SURVEY.md §2.4: ``Dataset.join``
    with ``left_anti``, hash-partitioned on the ref key). Only the thin
    (doc_id, span_index, ref) projection of the docs ever shuffles; the
    span payloads stay at the read.

    ``spans_col=None`` checks a TOP-LEVEL column of the row instead of a
    span-struct field (span_index emitted as -1), so flat tables get the
    same large-catalog path as interleaved documents."""
    from jsonschema_ray.functions.listops import flatten_spans
    from jsonschema_ray.spec.predicates import compile_predicate

    field = rule.params["field"]
    cat_key = rule.params.get("catalog_key", field)
    when = compile_predicate(rule.when) if rule.when else None
    if join_partitions is None:
        # Join reserves one aggregator per partition up front; more
        # partitions than cores deadlocks a small local session.
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        join_partitions = max(2, min(64, cpus // 2))

    def extract(t: pa.Table) -> pa.Table:
        if spans_col is None:
            flat = t
            parent = np.arange(t.num_rows, dtype=np.int64)
            span_idx = np.full(t.num_rows, -1, dtype=np.int32)
        else:
            flat, parent, span_idx = flatten_spans(t, spans_col)
        col = flat.column(field)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # Null-ref semantics must match the broadcast CatalogIndex path
        # (spec/compile.py _span_fail_masks): with a `when` guard, null
        # refs in guarded rows ARE violations (they match nothing in the
        # catalog — Ray's left_anti keeps null keys); without a guard,
        # null refs are skipped.
        if when is not None:
            mask = when(flat)
        else:
            mask = pc.is_valid(col).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(mask)
        doc_ids = t.column(doc_id_col)
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        return pa.table({
            "doc_id": pc.take(doc_ids, pa.array(parent[idx])),
            "span_index": pa.array(span_idx[idx], type=pa.int32()),
            "__ref": pc.take(col, pa.array(idx)),
        })

    refs = source.dataset().map_batches(extract, batch_format="pyarrow")
    catalog = catalog_source.dataset(columns=[cat_key])
    missing = refs.join(catalog, join_type="left_anti",
                        num_partitions=join_partitions,
                        on=("__ref",), right_on=(cat_key,))

    def to_violations(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = t.column("doc_id")
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if keys.type != pa.string():
            keys = keys.cast(pa.string())
        part = partition_of(keys, num_partitions) if n else np.empty(0, np.int32)
        return pa.Table.from_arrays(
            [keys,
             pa.array(np.full(n, rule.rule_id, dtype=object), type=pa.string()),
             t.column("span_index").cast(pa.int32())
             if not isinstance(t.column("span_index"), pa.ChunkedArray)
             else t.column("span_index").combine_chunks().cast(pa.int32()),
             pa.array(np.full(n, rule.message, dtype=object), type=pa.string()),
             pa.array(part, type=pa.int32())],
            schema=VIOLATION_PART_SCHEMA)

    return missing.map_batches(to_violations, batch_format="pyarrow")


@dataclass
class ValidationResult:
    """Lazy handle over the violations dataset + verdict accessors."""

    violations: Any  # ray.data.Dataset, schema VIOLATION_PART_SCHEMA
    plan: CheckPlan
    num_partitions: int
    _materialized: Any = field(default=None, repr=False)

    def materialize(self) -> "ValidationResult":
        if self._materialized is None:
            self._materialized = self.violations.materialize()
            self.violations = self._materialized
        return self

    def table(self) -> pa.Table:
        """All violation rows as one Arrow table (small-result path)."""
        self.materialize()
        batches = []
        for b in self.violations.iter_batches(batch_format="pyarrow", batch_size=None):
            if isinstance(b, pa.RecordBatch):
                b = pa.Table.from_batches([b])
            if b.num_rows:
                batches.append(b.select(VIOLATION_PART_SCHEMA.names))
        if not batches:
            return VIOLATION_PART_SCHEMA.empty_table()
        return pa.concat_tables(batches).combine_chunks()

    def sorted_table(self) -> pa.Table:
        """Deterministic output ordering (the reference sorts violations
        by position, ``/root/reference/src/command_lint.cc:670-675``)."""
        t = self.table()
        order = pc.sort_indices(t, sort_keys=[("doc_id", "ascending"),
                                              ("rule_id", "ascending"),
                                              ("span_index", "ascending")])
        return t.take(order)

    def _normalized(self):
        """Violations dataset with every block coerced to the canonical
        schema (Ray's groupby can emit zero-column empty blocks)."""
        def fix(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "part" not in b.schema.names:
                return VIOLATION_PART_SCHEMA.empty_table()
            return b.select(VIOLATION_PART_SCHEMA.names)
        return self.violations.map_batches(fix, batch_format="pyarrow")

    def sorted_head(self, limit: int) -> pa.Table:
        """First ``limit`` rows in deterministic order WITHOUT a driver
        concat: distributed sort + limit — only ``limit`` rows ever
        reach the driver. This is the report path for big results;
        ``sorted_table`` stays for tests / small results."""
        self.materialize()
        ds = self._normalized().sort(
            ["doc_id", "rule_id", "span_index"]).limit(limit)
        batches = [b for b in ds.iter_batches(batch_format="pyarrow",
                                              batch_size=None)
                   if b.num_rows]
        if not batches:
            return VIOLATION_PART_SCHEMA.empty_table()
        return pa.concat_tables(
            [b.select(VIOLATION_PART_SCHEMA.names) for b in batches]
        ).combine_chunks()

    def write_sorted(self, out_dir: str) -> None:
        """Globally sorted violation report as parquet, written straight
        from the cluster (the scale path for the reference's ordered
        text report — no driver materialization)."""
        self.materialize()
        self._normalized().sort(
            ["doc_id", "rule_id", "span_index"]).write_parquet(out_dir)

    def violation_count(self) -> int:
        self.materialize()
        return self.violations.count()

    def overall_pass(self) -> bool:
        """Fails only on error-severity rules — warning-severity rules
        report but don't flip the verdict (the reference's lint
        warning/error split applied to validation)."""
        warn_rules = {r.rule_id for r in self.plan.rules
                      if r.severity != "error"}
        if not warn_rules:
            return self.violation_count() == 0
        t = self.table()
        sev_error = pc.invert(pc.is_in(
            t.column("rule_id"), value_set=pa.array(sorted(warn_rules))))
        return t.filter(sev_error).num_rows == 0

    def exit_code(self) -> int:
        """2 on any error-severity violation (exit_code.h:7)."""
        return 0 if self.overall_pass() else 2

    def write(self, out_dir: str) -> None:
        """Write violations as hash-partitioned parquet
        (``out_dir/part=<i>/``) — the resumable layout: each partition
        directory is independently rewritable, and readers can prune by
        partition (never one giant file)."""
        self.violations.write_parquet(out_dir, partition_cols=["part"])

    def partition_verdicts(self) -> pa.Table:
        """(part, n_violations, pass) for every partition 0..P-1; a
        partition passes iff it holds no violation (SURVEY.md §2.5)."""
        self.materialize()
        counts = np.zeros(self.num_partitions, dtype=np.int64)
        for b in self.violations.iter_batches(batch_format="pyarrow"):
            # Ray's groupby→aggregate can emit zero-column empty blocks
            # (observed on empty groups); skip anything without rows.
            if b.num_rows == 0 or "part" not in b.schema.names:
                continue
            part = b.column("part").to_numpy(zero_copy_only=False)
            counts += np.bincount(part, minlength=self.num_partitions)
        return pa.table({
            "part": pa.array(np.arange(self.num_partitions, dtype=np.int32)),
            "n_violations": pa.array(counts),
            "passed": pa.array(counts == 0),
        })


def validate(
    source: Any,
    plan: CheckPlan | None = None,
    *,
    catalog_keys: Any = None,
    catalog_source: Any = None,
    num_partitions: int = 64,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: int | tuple[int, int] | None = None,
    only: Sequence[str] | None = None,
    exclude: Sequence[str] | None = None,
) -> ValidationResult:
    """Run a CheckPlan over a document source. Returns a lazy result.

    ``catalog_keys``: the media-catalog key column (numpy/Arrow array)
    for ``ref`` rules — broadcast once via the object store (small-side
    path). ``catalog_source``: a DocSource/path for the catalog table —
    used instead when the catalog is too large to broadcast (hash
    anti-join path). ``only`` / ``exclude`` mirror the reference's lint
    rule filters (``/root/reference/src/command_lint.cc:305-342``).
    """
    src = as_source(source)
    plan = (plan or default_plan()).filtered(
        only=list(only) if only else None,
        exclude=list(exclude) if exclude else None)
    plan_json = plan.to_json()
    catalog_ref = _maybe_put(catalog_keys)

    if concurrency is None:
        # stateless tasks + per-worker checker cache: elastic, no pool
        # spin-up; compiled state is cheap (catalog index is prebuilt)
        row_local = src.dataset().map_batches(
            make_validate_fn(plan_json, plan.plan_hash(), catalog_ref,
                             num_partitions),
            batch_format="pyarrow", batch_size=batch_size)
    else:
        row_local = src.dataset().map_batches(
            ValidateBatch,
            fn_constructor_kwargs={
                "plan_json": plan_json,
                "catalog": catalog_ref,
                "num_partitions": num_partitions,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    pieces = [row_local]
    for rule in plan.rules_of_kind("unique"):
        pieces.append(uniqueness_violations(
            src, rule.params["key"], rule.rule_id, rule.message, num_partitions))
    if catalog_keys is None and catalog_source is not None:
        for rule in plan.rules_of_kind("ref"):
            pieces.append(referential_violations_join(
                src, rule, as_source(catalog_source), num_partitions))

    stats_rules = plan.rules_of_kind("stats", "drift")
    if stats_rules:
        pieces.append(_stats_drift_violations(src, stats_rules))

    if catalog_keys is None and catalog_source is None \
            and plan.rules_of_kind("ref"):
        import logging

        logging.getLogger(__name__).warning(
            "plan has ref rules (%s) but no catalog_keys/catalog_source "
            "was provided — referential checks are SKIPPED",
            [r.rule_id for r in plan.rules_of_kind("ref")])

    violations = pieces[0]
    if len(pieces) > 1:
        violations = violations.union(*pieces[1:])
    return ValidationResult(violations=violations, plan=plan,
                            num_partitions=num_partitions)


def fast_validate(
    source: Any,
    plan: CheckPlan | None = None,
    *,
    catalog_keys: Any = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: int | tuple[int, int] | None = None,
    include_dataset_rules: bool = True,
) -> dict[str, Any]:
    """Verdict-only mode (the ``--fast`` analog, compiler.h:84): no
    violation strings are ever materialized; per-batch (docs, failed)
    partials are summed. Returns {docs, failed_docs, passed}."""
    from ray.data.aggregate import Sum

    src = as_source(source)
    plan = plan or default_plan()
    plan_json = plan.to_json()
    catalog_ref = _maybe_put(catalog_keys)

    if concurrency is None:
        partials = src.dataset().map_batches(
            make_fast_verdict_fn(plan_json, plan.plan_hash(), catalog_ref),
            batch_format="pyarrow", batch_size=batch_size)
    else:
        partials = src.dataset().map_batches(
            FastVerdictBatch,
            fn_constructor_kwargs={"plan_json": plan_json,
                                   "catalog": catalog_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    agg = partials.aggregate(Sum("docs", alias_name="docs"),
                             Sum("failed_docs", alias_name="failed_docs"))
    docs, failed = int(agg["docs"] or 0), int(agg["failed_docs"] or 0)

    dup_keys = 0
    if include_dataset_rules:
        for rule in plan.rules_of_kind("unique"):
            dups = uniqueness_violations(src, rule.params["key"], rule.rule_id,
                                         rule.message, num_partitions=1)
            dup_keys += dups.count()
    return {"docs": docs, "failed_docs": failed, "dup_keys": dup_keys,
            "passed": failed == 0 and dup_keys == 0}


# ---------------------------------------------------------------------------
# Bloom-filter referential pre-check — the catalog-membership SCALE
# path. The broadcast CatalogIndex (exact) tops out when the key set
# itself no longer fits a worker heap; a Bloom filter at 1% fpp is
# ~1.2 bytes/key (10^9 keys ≈ 1.2 GB vs ~25+ GB of raw refs).
# Semantics are one-sided: every flagged row is a CERTAIN violation
# (a catalog member always probes true, so no false accusations),
# while ≈fpp of true violations collide into "probably present" and
# slip through — the documented trade for replacing the exact
# anti-join's shuffle with a zero-shuffle streaming probe. Where
# exactness is required, the exact paths above remain the answer;
# the bloom is the triage tier at 10^12 rows.
# ---------------------------------------------------------------------------

def build_catalog_bloom(catalog_source: Any, col: str, *,
                        fpp: float = 0.01,
                        batch_size: int = 1 << 16,
                        hash_mode: str = "fast"):
    """Distributed Bloom build: per-batch partial filters (identical
    shape, sized once from the catalog row count) OR-merge
    associatively — no shuffle, one pre-merge level bounds what the
    driver reads (the profile() tree-merge pattern). Returns the
    merged BloomFilter."""
    import pyarrow as pa

    from jsonschema_ray.functions.sketches import BloomFilter
    from jsonschema_ray.sources.readers import as_source

    src = as_source(catalog_source)
    ds = src.dataset(columns=[col])
    n = ds.count()
    proto = BloomFilter.for_capacity(n, fpp, hash_mode)
    n_bits, k = proto.n_bits, proto.k

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits, k, hash_mode)
        arr = t.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.drop_null().to_numpy(zero_copy_only=False)
        if len(vals):
            bf.add(vals.astype(object) if vals.dtype == object else vals)
        return pa.table({"bloom": pa.array([bf.serialize()], pa.binary())})

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bloom" not in t.column_names:
            return pa.table({"bloom": pa.array([], pa.binary())})
        acc = None
        for raw in t.column("bloom").to_pylist():
            other = BloomFilter.deserialize(raw)
            acc = other if acc is None else acc.merge(other)
        return pa.table({"bloom": pa.array([acc.serialize()], pa.binary())})

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size)
            .repartition(target_num_rows_per_block=8)
            .map_batches(merge_block, batch_format="pyarrow",
                         batch_size=None)
            .take_all())
    out = BloomFilter(n_bits, k, hash_mode)
    for r in rows:
        out.merge(BloomFilter.deserialize(r["bloom"]))
    return out


class _BloomProbe:
    """Actor stage: keep rows whose ref is NOT (probably) in the
    catalog — i.e. definite-or-probable violations. Deserializes the
    broadcast filter once per actor."""

    def __init__(self, bloom_ref: Any, col: str, invert: bool = False):
        from jsonschema_ray.functions.sketches import BloomFilter
        from jsonschema_ray.stages.validator import _resolve_ref

        raw = _resolve_ref(bloom_ref)
        self.bf = raw if isinstance(raw, BloomFilter) \
            else BloomFilter.deserialize(raw)
        self.col = col
        self.invert = invert

    def __call__(self, t):
        import pyarrow as pa

        arr = t.column(self.col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.to_numpy(zero_copy_only=False)
        hit = self.bf.contains(
            vals.astype(object) if vals.dtype == object else vals)
        if arr.null_count:    # null refs never match the catalog
            hit &= arr.is_valid().to_numpy(zero_copy_only=False)
        keep = hit if self.invert else ~hit
        return t.filter(pa.array(keep))


def bloom_ref_check(source: Any, col: str, bloom, *,
                    columns=None, concurrency=(1, 8),
                    batch_size: int = DEFAULT_BATCH_SIZE,
                    invert: bool = False):
    """Probe stage: stream the big side once, emit only rows whose
    ``col`` misses the catalog Bloom filter — each one a certain
    violation; ≈fpp of true violations slip through (see module
    section comment). ``invert=True`` keeps probable members instead.
    The filter ships via one ``ray.put``; each actor deserializes
    once in ``__init__``."""
    import ray

    from jsonschema_ray.sources.readers import as_source

    raw = bloom.serialize()
    ref = ray.put(raw) if ray.is_initialized() else raw
    cols = sorted({col} | set(columns or []))
    return as_source(source).dataset(columns=cols).map_batches(
        _BloomProbe,
        fn_constructor_kwargs={"bloom_ref": ref, "col": col,
                               "invert": invert},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
