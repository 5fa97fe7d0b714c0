"""Dataset-scale schema-document operations: fmt + upgrade as Ray
Data actor-pool stages.

The reference formats/upgrades one schema file at a time
(``src/command_fmt.cc`` / ``src/command_upgrade.cc``); at scale the
same canonical-format and dialect-migration machinery
(``spec/format.py`` / ``spec/alterschema.py`` — both pinned byte-exact
by their corpus replays) runs over a COLUMN of schema documents. Both
are embarrassingly parallel per document: no shuffle, output one row
per input row.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa


class FormatSchemasBatch:
    """``map_batches`` actor: canonically format a JSON-string schema
    column (the fmt verb's keyword reorder + reference prettify).
    Emits the formatted text plus a ``changed`` flag (the analog of
    ``fmt --check`` per document)."""

    def __init__(self, column: str = "schema",
                 id_column: str = "schema_id",
                 default_dialect: str | None = None,
                 indent: int = 2):
        from jsonschema_ray.spec.format import prettify_schema

        self._prettify = prettify_schema
        self.column = column
        self.id_column = id_column
        self.default_dialect = default_dialect
        self.indent = indent

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        ids = batch.column(self.id_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out_ids, out_text, out_changed, out_error = [], [], [], []
        for i in range(len(col)):
            raw = col[i].as_py()
            sid = ids[i].as_py()
            out_ids.append(sid)
            if raw is None:
                out_text.append(None)
                out_changed.append(False)
                out_error.append("null document")
                continue
            try:
                doc = json.loads(raw)
                text = self._prettify(
                    doc, indent=self.indent,
                    default_dialect=self.default_dialect)
            except Exception as exc:   # noqa: BLE001 — per-row verdict
                out_text.append(None)
                out_changed.append(False)
                out_error.append(str(exc)[:200])
                continue
            out_text.append(text)
            out_changed.append(text != raw and text != raw + "\n")
            out_error.append(None)
        return pa.table({
            "schema_id": pa.array(out_ids, type=pa.string()),
            "formatted": pa.array(out_text, type=pa.string()),
            "changed": pa.array(out_changed, type=pa.bool_()),
            "error": pa.array(out_error, type=pa.string()),
        })


class UpgradeSchemasBatch:
    """``map_batches`` actor: migrate a JSON-string schema column to a
    target dialect (the upgrade verb's staged alterschema rule sets)."""

    def __init__(self, column: str = "schema",
                 id_column: str = "schema_id", to: str = "2020-12"):
        from jsonschema_ray.spec.alterschema import upgrade_schema

        self._upgrade = upgrade_schema
        self.column = column
        self.id_column = id_column
        self.to = to

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        ids = batch.column(self.id_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out_ids, out_doc, out_error = [], [], []
        for i in range(len(col)):
            raw = col[i].as_py()
            sid = ids[i].as_py()
            out_ids.append(sid)
            if raw is None:
                out_doc.append(None)
                out_error.append("null document")
                continue
            try:
                doc = json.loads(raw)
                upgraded = self._upgrade(doc, to=self.to)
                out_doc.append(json.dumps(upgraded, ensure_ascii=False))
                out_error.append(None)
            except Exception as exc:   # noqa: BLE001 — per-row verdict
                out_doc.append(None)
                out_error.append(str(exc)[:200])
        return pa.table({
            "schema_id": pa.array(out_ids, type=pa.string()),
            "upgraded": pa.array(out_doc, type=pa.string()),
            "error": pa.array(out_error, type=pa.string()),
        })


def format_schemas(dataset, *, column: str = "schema",
                   id_column: str = "schema_id",
                   default_dialect: str | None = None, indent: int = 2,
                   concurrency=(1, 8), batch_size: int = 256):
    return dataset.map_batches(
        FormatSchemasBatch,
        fn_constructor_kwargs={
            "column": column, "id_column": id_column,
            "default_dialect": default_dialect, "indent": indent},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def upgrade_schemas(dataset, *, column: str = "schema",
                    id_column: str = "schema_id", to: str = "2020-12",
                    concurrency=(1, 8), batch_size: int = 256):
    return dataset.map_batches(
        UpgradeSchemasBatch,
        fn_constructor_kwargs={"column": column, "id_column": id_column,
                               "to": to},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


class MetaschemaBatch:
    """``map_batches`` actor: validate each schema document against its
    declared dialect's metaschema (the metaschema verb at dataset
    scale, via the SimpleOutput-parity evaluator). Official
    metaschemas load once per actor; emits one verdict row per
    document with the first failure message."""

    def __init__(self, column: str = "schema",
                 id_column: str = "schema_id",
                 default_dialect: str | None = None):
        from jsonschema_ray.spec.describe import (explain_against_metaschema,
                                                  official_registry)

        official_registry()   # warm the per-actor metaschema cache
        self._explain = explain_against_metaschema
        self.column = column
        self.id_column = id_column
        self.default_dialect = default_dialect

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        ids = batch.column(self.id_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out_ids, out_valid, out_n, out_first = [], [], [], []
        for i in range(len(col)):
            raw = col[i].as_py()
            out_ids.append(ids[i].as_py())
            try:
                doc = json.loads(raw) if isinstance(raw, str) else raw
                dialect = doc.get("$schema") if isinstance(doc, dict) \
                    else None
                dialect = dialect if isinstance(dialect, str) \
                    else self.default_dialect
                if not dialect:
                    raise ValueError("no determinable dialect")
                ok, entries = self._explain(doc, dialect)
            except Exception as exc:   # noqa: BLE001 — per-row verdict
                out_valid.append(False)
                out_n.append(-1)
                out_first.append(str(exc)[:200])
                continue
            out_valid.append(bool(ok))
            out_n.append(0 if ok else len(entries))
            out_first.append(
                entries[0].message[:200] if (not ok and entries) else None)
        return pa.table({
            "schema_id": pa.array(out_ids, type=pa.string()),
            "valid": pa.array(out_valid, type=pa.bool_()),
            "errors": pa.array(out_n, type=pa.int32()),
            "first_error": pa.array(out_first, type=pa.string()),
        })


def metaschema_check(dataset, *, column: str = "schema",
                     id_column: str = "schema_id",
                     default_dialect: str | None = None,
                     concurrency=(1, 8), batch_size: int = 256):
    """Per-document metaschema verdicts over a schema column (lazy)."""
    return dataset.map_batches(
        MetaschemaBatch,
        fn_constructor_kwargs={"column": column, "id_column": id_column,
                               "default_dialect": default_dialect},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)
