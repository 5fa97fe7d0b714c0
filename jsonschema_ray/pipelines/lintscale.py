"""Dataset-scale schema linting — the blaze alterschema registry as a
Ray Data actor-pool stage.

The reference lints one schema file at a time
(``src/command_lint.cc``); at 10^12 scale the same 103-rule registry
(``spec/lintrules.py``) runs over a COLUMN of schema documents: the
registry is constructed once per actor in ``__init__`` (rule objects
are stateless between documents), each batch json-parses its documents
and frames+checks them vectorized-per-doc, and findings stream out as
one row per (document, rule, location) — the exact analog of the
engine's violation rows, keyed for deterministic ordering.

Scale notes: no shuffle at all — linting is embarrassingly parallel
per document; output is a thin findings table (ids + rule names +
pointer strings), so the only wide operation a consumer might add
(per-rule counts) is a groupby over a low-cardinality key (103 rules).
"""

from __future__ import annotations

import json
from typing import Any, Sequence

import pyarrow as pa

FINDINGS_SCHEMA = pa.schema([
    ("schema_id", pa.string()),
    ("rule_id", pa.string()),
    ("location", pa.string()),
    ("message", pa.string()),
])


class LintSchemasBatch:
    """``map_batches`` actor: lint a JSON-string schema column.

    The rule registry and filters compile once per actor; per batch the
    work is pure Python over small schema documents (schemas are
    KB-scale — the dataset is wide, not the documents)."""

    def __init__(self, column: str = "schema",
                 id_column: str = "schema_id",
                 only: Sequence[str] | None = None,
                 exclude: Sequence[str] | None = None,
                 default_dialect: str | None = None):
        from jsonschema_ray.spec import lintrules as LR

        rules = LR.build_registry()
        if only:
            keep = set(only)
            rules = [r for r in rules if r.name in keep]
        elif exclude:
            drop = set(exclude)
            rules = [r for r in rules if r.name not in drop]
        self._rules = rules
        self._LR = LR
        self.column = column
        self.id_column = id_column
        self.default_dialect = default_dialect

    def lint_one(self, doc: Any) -> list[tuple[str, str, str]]:
        """(rule, location, message) findings for one parsed schema."""
        LR = self._LR
        out: list[tuple[str, str, str]] = []

        def cb(pointer, name, message, result, _applied):
            for loc in (result.locations or [()]):
                out.append((name, LR.ptr_str(pointer + tuple(loc)),
                            message))

        try:
            LR.check(doc, self._rules, cb,
                     default_dialect=self.default_dialect or "")
        except Exception as exc:   # noqa: BLE001 — frame rejects → row
            out.append(("__error__", "", str(exc)))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        ids = batch.column(self.id_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sids: list[str] = []
        rids: list[str] = []
        locs: list[str] = []
        msgs: list[str] = []
        for i in range(len(col)):
            raw = col[i].as_py()
            sid = ids[i].as_py()
            if raw is None:
                # emit an accounting row so every input id appears in the
                # findings table (consistent with __parse_error__ rows)
                sids.append(sid)
                rids.append("__null__")
                locs.append("")
                msgs.append("null schema document")
                continue
            try:
                doc = json.loads(raw) if isinstance(raw, str) else raw
            except (TypeError, ValueError):
                sids.append(sid)
                rids.append("__parse_error__")
                locs.append("")
                msgs.append("invalid JSON document")
                continue
            for rule_id, loc, msg in self.lint_one(doc):
                sids.append(sid)
                rids.append(rule_id)
                locs.append(loc)
                msgs.append(msg)
        return pa.table({
            "schema_id": pa.array(sids, type=pa.string()),
            "rule_id": pa.array(rids, type=pa.string()),
            "location": pa.array(locs, type=pa.string()),
            "message": pa.array(msgs, type=pa.string()),
        })


def lint_schemas(dataset, *, column: str = "schema",
                 id_column: str = "schema_id",
                 only: Sequence[str] | None = None,
                 exclude: Sequence[str] | None = None,
                 default_dialect: str | None = None,
                 concurrency=(1, 8), batch_size: int = 256):
    """Findings Dataset over a schema-document column (lazy)."""
    return dataset.map_batches(
        LintSchemasBatch,
        fn_constructor_kwargs={
            "column": column, "id_column": id_column, "only": only,
            "exclude": exclude, "default_dialect": default_dialect},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def synth_schema_corpus(n: int, seed: int = 7) -> pa.Table:
    """Deterministic schema-document corpus mixing lint-clean and
    lint-dirty shapes (for tests/benchmarks; seeded, no external
    data)."""
    import random

    rng = random.Random(seed)
    dirty = [
        # enum_with_type + duplicate_enum_values
        lambda: {"$schema": "http://json-schema.org/draft-04/schema#",
                 "title": "T", "description": "D",
                 "type": "string", "enum": ["a", "a"]},
        # const_with_type + top-level title/description/examples gaps
        lambda: {"$schema":
                 "https://json-schema.org/draft/2020-12/schema",
                 "type": "integer", "const": 3},
        # then_without_if + single_type_array
        lambda: {"$schema":
                 "https://json-schema.org/draft/2020-12/schema",
                 "title": "T", "description": "D", "examples": [1],
                 "type": ["integer"], "then": {"minimum": 1}},
        # unknown keyword
        lambda: {"$schema":
                 "https://json-schema.org/draft/2020-12/schema",
                 "title": "T", "description": "D", "examples": [1],
                 "frobnicate": True},
    ]
    clean = lambda: {  # noqa: E731
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": "T", "description": "D", "examples": [1],
        "type": rng.choice(["string", "integer", "object"])}
    ids, docs = [], []
    for i in range(n):
        ids.append(f"s{i:06d}")
        make = rng.choice(dirty) if rng.random() < 0.5 else clean
        docs.append(json.dumps(make()))
    return pa.table({"schema_id": pa.array(ids),
                     "schema": pa.array(docs)})
