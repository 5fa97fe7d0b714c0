"""Driver-side CheckPlan → row-local kernel compiler.

The analog of Blaze's ``compile()``
(``/root/reference/vendor/blaze/src/compiler/compile.cc``): rule specs
become closed-over vectorized kernels once — on the driver or, in the
distributed pipeline, inside each validator actor's ``__init__`` — and
the per-batch hot path interprets nothing.

The compiled artifact handles every **row-local** rule kind:

- ``predicate``/span  → kernels over the flattened span-struct table
- ``predicate``/doc   → kernels over doc columns (+ virtual ``n_spans``)
- ``monotonic``       → windowed diff over flattened offsets per doc
- ``ref``             → membership against a broadcast catalog key set
                         (the broadcast path; the hash anti-join path
                         for huge catalogs lives in pipelines/validate.py)

Dataset-scope kinds (``unique``, ``stats``, ``drift``) are orchestrated
by the pipeline, not here.

Like the reference's ``Exhaustive`` vs ``FastValidation`` modes
(``compiler.h:84``), the checker exposes two entry points:
``violations(batch)`` emits exact violation rows; ``fail_mask(batch)``
only computes the per-doc boolean (cheaper: no string materialization).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsonschema_ray.functions.listops import flatten_spans, monotonic_violations, span_lengths
from jsonschema_ray.spec.plan import CheckPlan
from jsonschema_ray.spec.predicates import compile_predicate

VIOLATION_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("rule_id", pa.string()),
    ("span_index", pa.int32()),   # -1 for doc-scope rules
    ("message", pa.string()),
])

DOC_SCOPE_SPAN_INDEX = -1


def empty_violations() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


class CompiledRowChecker:
    """All row-local rules of a plan, compiled. One instance per actor."""

    def __init__(
        self,
        plan: CheckPlan | dict[str, Any],
        catalog_keys: pa.Array | np.ndarray | list | None = None,
        doc_id_col: str = "doc_id",
        spans_col: str = "spans",
    ):
        if isinstance(plan, dict):
            plan = CheckPlan.from_json(plan)
        self.plan = plan
        self.doc_id_col = doc_id_col
        self.spans_col = spans_col

        from jsonschema_ray.functions.catalog import CatalogIndex

        self._span_rules: list[tuple[str, Any, Any, str]] = []
        self._doc_rules: list[tuple[str, Any, Any, str]] = []
        self._mono_rules: list[tuple[str, str, bool, str]] = []
        self._ref_rules: list[tuple[str, str, Any, str]] = []
        self._contains_rules: list[tuple[str, Any, int, Any, str]] = []
        self._uniq_item_rules: list[tuple[str, str, str]] = []
        self._jschema_rules: list[tuple[str, str, Any, Any, str]] = []
        catalog = None
        if catalog_keys is not None:
            # one-time index build — per-batch membership is then
            # O(b log m); pc.is_in would rebuild its set every call.
            # A pre-built (broadcast) index is used as-is.
            catalog = catalog_keys if isinstance(catalog_keys, CatalogIndex) \
                else CatalogIndex(catalog_keys)

        for r in plan.rules:
            if not r.enabled:
                continue
            when = compile_predicate(r.when) if r.when else None
            if r.kind == "predicate":
                check = compile_predicate(r.check)
                bucket = self._span_rules if r.scope == "span" else self._doc_rules
                bucket.append((r.rule_id, when, check, r.message))
            elif r.kind == "monotonic":
                self._mono_rules.append(
                    (r.rule_id, r.params.get("field", "offset"),
                     bool(r.params.get("strict", True)), r.message))
            elif r.kind == "contains":
                # LoopContains analog (evaluator_instruction.h:115):
                # count of spans matching the predicate must fall in
                # [min, max]; doc-scope violation.
                self._contains_rules.append(
                    (r.rule_id, compile_predicate(r.params["predicate"]),
                     int(r.params.get("min", 1)), r.params.get("max"),
                     r.message))
            elif r.kind == "unique_items":
                # AssertionUnique analog (dispatch :814-818) at span
                # granularity: values of spans[field] distinct within a
                # doc (nulls exempt); later duplicates are flagged.
                self._uniq_item_rules.append(
                    (r.rule_id, r.params["field"], r.message))
            elif r.kind == "json_schema":
                # full JSON Schema over a JSON-string (or struct) column:
                # the dynamic-keyword evaluator (LoopProperties*/LoopKeys/
                # recursion/unevaluated*; see spec/jschema.py). Compiled
                # once HERE — i.e. once per validator actor — the per-row
                # hot path is parse + closure, no interpretation.
                from jsonschema_ray.spec.jschema import compile_schema
                self._jschema_rules.append(
                    (r.rule_id, r.params["field"],
                     compile_schema(r.params["schema"]), when, r.message))
            elif r.kind == "ref":
                if catalog is None:
                    continue  # pipeline runs the anti-join path instead
                self._ref_rules.append(
                    (r.rule_id, r.params["field"], when, r.message))
                self._catalog = catalog
            # unique/stats/drift: dataset scope — handled by the pipeline

    # ------------------------------------------------------------------
    def _span_fail_masks(self, flat: pa.Table, parent: np.ndarray):
        """Yield (rule_id, message, flat-span violation mask)."""
        for rule_id, when, check, message in self._span_rules:
            mask = ~check(flat)
            if when is not None:
                mask &= when(flat)
            yield rule_id, message, mask
        for rule_id, field, strict, message in self._mono_rules:
            yield rule_id, message, monotonic_violations(
                flat.column(field), parent, strict=strict)
        for rule_id, field, message in self._uniq_item_rules:
            import pandas as pd

            col = flat.column(field)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            vals = col.to_numpy(zero_copy_only=False)
            dup = pd.DataFrame({"p": parent, "v": vals}) \
                .duplicated(subset=["p", "v"]).to_numpy()
            yield rule_id, message, dup & valid
        for rule_id, field, when, message in self._ref_rules:
            col = flat.column(field)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mask = ~self._catalog.contains(col)
            if when is not None:
                mask &= when(flat)
            else:
                mask &= pc.is_valid(col).to_numpy(zero_copy_only=False)
            yield rule_id, message, mask

    def _jschema_fail(self, batch: pa.Table):
        """Yield (rule_id, per-doc violation mask, per-doc messages) for
        ``json_schema`` rules. The column may hold JSON strings (parsed
        here, the dominating cost) or an already-structured struct/list
        column (``to_pylist`` only). A null member is absent → valid."""
        import json as _json

        for rule_id, field, cs, when, message in self._jschema_rules:
            col = batch.column(field)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = col.to_pylist()
            n = len(vals)
            mask = np.zeros(n, dtype=bool)
            msgs = np.full(n, None, dtype=object)
            wmask = when(batch) if when is not None else None
            for i, s in enumerate(vals):
                if s is None or (wmask is not None and not wmask[i]):
                    continue
                if isinstance(s, (str, bytes)):
                    try:
                        s = _json.loads(s)
                    except ValueError:
                        mask[i] = True
                        msgs[i] = f"{message} [invalid JSON]"
                        continue
                errs = cs.validate(s)
                if errs:
                    p, kw, m = errs[0]
                    mask[i] = True
                    msgs[i] = f"{message} [{p or '/'} {kw}: {m}]"
            yield rule_id, mask, msgs

    def _contains_fail_masks(self, flat: pa.Table, parent: np.ndarray,
                             n_docs: int):
        """Yield (rule_id, message, per-DOC violation mask) for
        ``contains`` rules: matching-span count outside [min, max]."""
        for rule_id, pred, lo, hi, message in self._contains_rules:
            mask = pred(flat)
            counts = np.bincount(parent[mask], minlength=n_docs)
            bad = counts < lo
            if hi is not None:
                bad |= counts > hi
            yield rule_id, message, bad

    def _doc_table(self, batch: pa.Table) -> pa.Table:
        """Doc-scope view: doc columns + virtual ``n_spans``."""
        if self._doc_rules and self.spans_col in batch.column_names:
            n = span_lengths(batch.column(self.spans_col))
            batch = batch.append_column("n_spans", pa.array(n))
        return batch

    # ------------------------------------------------------------------
    @staticmethod
    def _with_span_index(flat: pa.Table, span_idx: np.ndarray) -> pa.Table:
        """Expose the span's position as virtual field ``_span_index`` —
        enables prefixItems-style positional rules (AssertionArrayPrefix
        analog): e.g. when {op: eq, field: _span_index, value: 0}."""
        return flat.append_column("_span_index",
                                  pa.array(span_idx, type=pa.int32()))

    def _flat_or_none(self, batch: pa.Table):
        """Flatten spans when present; a spanless batch (pure doc-scope
        plan, e.g. a columnar table validated via schema_to_plan) is
        fine as long as no span-scope rule needs the column."""
        if self.spans_col in batch.column_names:
            flat, parent, span_idx = flatten_spans(batch, self.spans_col)
            return self._with_span_index(flat, span_idx), parent, span_idx
        if self._span_rules or self._mono_rules or self._uniq_item_rules \
                or self._ref_rules or self._contains_rules:
            raise KeyError(
                f"plan has span-scope rules but batch lacks column "
                f"{self.spans_col!r}")
        empty = np.empty(0, dtype=np.int64)
        return pa.table({}), empty, empty.astype(np.int32)

    def violations(self, batch: pa.Table) -> pa.Table:
        """Exhaustive mode: exact violation rows for one batch."""
        flat, parent, span_idx = self._flat_or_none(batch)
        doc_ids = batch.column(self.doc_id_col)
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        if not pa.types.is_string(doc_ids.type):
            # violation rows carry string doc ids; predicates upstream
            # still see the column's native type
            doc_ids = doc_ids.cast(pa.string())

        parts_parent: list[np.ndarray] = []
        parts_span: list[np.ndarray] = []
        parts_rule: list[np.ndarray] = []
        parts_msg: list[np.ndarray] = []

        for rule_id, message, mask in self._span_fail_masks(flat, parent):
            if not mask.any():
                continue
            idx = np.flatnonzero(mask)
            parts_parent.append(parent[idx])
            parts_span.append(span_idx[idx])
            parts_rule.append(np.full(len(idx), rule_id, dtype=object))
            parts_msg.append(np.full(len(idx), message, dtype=object))

        doc_table = self._doc_table(batch)
        for rule_id, when, check, message in self._doc_rules:
            mask = ~check(doc_table)
            if when is not None:
                mask &= when(doc_table)
            if not mask.any():
                continue
            idx = np.flatnonzero(mask)
            parts_parent.append(idx.astype(np.int64))
            parts_span.append(np.full(len(idx), DOC_SCOPE_SPAN_INDEX, dtype=np.int32))
            parts_rule.append(np.full(len(idx), rule_id, dtype=object))
            parts_msg.append(np.full(len(idx), message, dtype=object))

        for rule_id, message, mask in self._contains_fail_masks(
                flat, parent, batch.num_rows):
            if not mask.any():
                continue
            idx = np.flatnonzero(mask)
            parts_parent.append(idx.astype(np.int64))
            parts_span.append(np.full(len(idx), DOC_SCOPE_SPAN_INDEX, dtype=np.int32))
            parts_rule.append(np.full(len(idx), rule_id, dtype=object))
            parts_msg.append(np.full(len(idx), message, dtype=object))

        for rule_id, mask, msgs in self._jschema_fail(batch):
            if not mask.any():
                continue
            idx = np.flatnonzero(mask)
            parts_parent.append(idx.astype(np.int64))
            parts_span.append(np.full(len(idx), DOC_SCOPE_SPAN_INDEX, dtype=np.int32))
            parts_rule.append(np.full(len(idx), rule_id, dtype=object))
            parts_msg.append(msgs[idx])

        if not parts_parent:
            return empty_violations()
        all_parent = np.concatenate(parts_parent)
        return pa.Table.from_arrays(
            [
                pc.take(doc_ids, pa.array(all_parent)),
                pa.array(np.concatenate(parts_rule), type=pa.string()),
                pa.array(np.concatenate(parts_span).astype(np.int32), type=pa.int32()),
                pa.array(np.concatenate(parts_msg), type=pa.string()),
            ],
            schema=VIOLATION_SCHEMA,
        )

    def trace(self, batch: pa.Table) -> pa.Table:
        """Annotation/trace rows: one row per (doc, rule[, span]) with
        its outcome — the analog of the reference's ``--trace`` step log
        (``/root/reference/vendor/blaze/src/output/output_simple.cc:83-93``:
        every instruction's push/pop with verdict). A rule whose
        ``when`` guard is unsatisfied traces as "pass" (it did not
        fire). Exhaustive by construction — intended for small slices;
        the CLI gates it behind ``--trace N``."""
        flat, parent, span_idx = self._flat_or_none(batch)
        doc_ids = batch.column(self.doc_id_col)
        if isinstance(doc_ids, pa.ChunkedArray):
            doc_ids = doc_ids.combine_chunks()
        if not pa.types.is_string(doc_ids.type):
            doc_ids = doc_ids.cast(pa.string())

        did, rid, sidx, outc = [], [], [], []

        def emit_span(rule_id: str, fail: np.ndarray):
            did.append(parent)
            rid.append(np.full(len(parent), rule_id, dtype=object))
            sidx.append(span_idx)
            outc.append(np.where(fail, "fail", "pass"))

        def emit_doc(rule_id: str, fail: np.ndarray):
            n = batch.num_rows
            did.append(np.arange(n, dtype=np.int64))
            rid.append(np.full(n, rule_id, dtype=object))
            sidx.append(np.full(n, DOC_SCOPE_SPAN_INDEX, dtype=np.int32))
            outc.append(np.where(fail, "fail", "pass"))

        for rule_id, _, mask in self._span_fail_masks(flat, parent):
            emit_span(rule_id, mask)
        doc_table = self._doc_table(batch)
        for rule_id, when, check, _ in self._doc_rules:
            mask = ~check(doc_table)
            if when is not None:
                mask &= when(doc_table)
            emit_doc(rule_id, mask)
        for rule_id, _, mask in self._contains_fail_masks(
                flat, parent, batch.num_rows):
            emit_doc(rule_id, mask)
        for rule_id, mask, _ in self._jschema_fail(batch):
            emit_doc(rule_id, mask)

        if not did:
            return pa.table({"doc_id": pa.array([], type=pa.string()),
                             "rule_id": pa.array([], type=pa.string()),
                             "span_index": pa.array([], type=pa.int32()),
                             "outcome": pa.array([], type=pa.string())})
        all_parent = np.concatenate(did)
        t = pa.table({
            "doc_id": pc.take(doc_ids, pa.array(all_parent)),
            "rule_id": pa.array(np.concatenate(rid), type=pa.string()),
            "span_index": pa.array(np.concatenate(sidx).astype(np.int32)),
            "outcome": pa.array(np.concatenate(outc), type=pa.string()),
        })
        return t.take(pc.sort_indices(t, sort_keys=[
            ("doc_id", "ascending"), ("rule_id", "ascending"),
            ("span_index", "ascending")]))

    def fail_mask(self, batch: pa.Table) -> np.ndarray:
        """Fast mode: per-doc boolean "has any row-local violation"."""
        flat, parent, span_idx = self._flat_or_none(batch)
        n = batch.num_rows
        fail = np.zeros(n, dtype=bool)
        for _, _, mask in self._span_fail_masks(flat, parent):
            if mask.any():
                fail |= np.bincount(parent[mask], minlength=n).astype(bool)
        doc_table = self._doc_table(batch)
        for _, when, check, _ in self._doc_rules:
            mask = ~check(doc_table)
            if when is not None:
                mask &= when(doc_table)
            fail |= mask
        for _, _, mask in self._contains_fail_masks(flat, parent, n):
            fail |= mask
        for _, mask, _ in self._jschema_fail(batch):
            fail |= mask
        return fail
