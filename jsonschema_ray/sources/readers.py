"""Document sources — column-prunable dataset factories.

Dataset-scope checks read different column subsets (uniqueness needs
only ``doc_id``; stats need only the profiled columns), so the pipeline
wants a *factory* it can ask for a pruned ``Dataset``, not one fixed
Dataset. At 100 TB the difference between re-scanning the full
interleaved table and re-scanning one thin string column is the whole
game — Parquet/Lance both serve single columns without touching span
payloads.

The reference's input layer (``/root/reference/src/input.h:426-510``)
expands files/dirs/JSONL into a sorted in-memory vector; here a source
is lazy and sharded by construction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence


class DocSource:
    """Factory for (optionally column-pruned) ``ray.data.Dataset``s."""

    def dataset(self, columns: Sequence[str] | None = None):
        raise NotImplementedError


@dataclass
class ParquetSource(DocSource):
    """Parquet-backed table (the sandbox stand-in for Lance — identical
    Arrow blocks; see FIXTURES.md preamble)."""

    paths: str | list[str]
    override_num_blocks: int | None = None

    def dataset(self, columns: Sequence[str] | None = None):
        from jsonschema_ray.raycompat import read_parquet_clean

        return read_parquet_clean(
            self.paths,
            columns=list(columns) if columns else None,
            override_num_blocks=self.override_num_blocks,
        )


@dataclass
class LanceSource(DocSource):
    """Lance-backed table (north-rule storage; requires ``pylance``,
    which is not installed in this sandbox — kept behind this flag so
    the engine is format-agnostic, FIXTURES.md preamble)."""

    uri: str

    def dataset(self, columns: Sequence[str] | None = None):
        import importlib.util
        import sys

        import ray.data as rd

        have_lance = "lance" in sys.modules   # incl. injected test shim
        if not have_lance:
            try:
                have_lance = importlib.util.find_spec("lance") is not None
            except ValueError:
                have_lance = True
        if not hasattr(rd, "read_lance") or not have_lance:
            raise NotImplementedError(
                "Lance reader needs the `pylance` package (absent in this "
                "sandbox); the same pipelines run on ParquetSource, which "
                "shares the column-pruned DocSource contract")
        return rd.read_lance(self.uri, columns=list(columns) if columns else None)


@dataclass
class JsonlSource(DocSource):
    """JSONL / JSONL.GZ documents — the reference's flagship input
    (``/root/reference/src/input.h:279-338``: one JSON doc per line,
    transparent gzip). ``ray.data.read_json`` parses nested
    list<struct> span payloads natively; gzip is auto-detected from
    the ``.gz`` extension by the Arrow reader."""

    paths: str | list[str]

    def dataset(self, columns: Sequence[str] | None = None):
        import ray.data as rd

        ds = rd.read_json(self.paths)
        if columns:
            ds = ds.select_columns(list(columns))
        return ds


@dataclass
class JsonlCheckedSource(DocSource):
    """JSON / JSONL input with a POSITION TRACKER — the analog of the
    reference's parse-error reporting (``src/input.h:279-338`` keeps a
    line cursor so errors print ``path:line:col``). Two file-parallel
    scans over the same file list: ``errors()`` → Dataset
    ``(path, line, col, message)`` for every malformed document, and
    ``dataset()`` → the well-formed rows. Parsing is per-line Python —
    deliberate: the position data IS the product here; once inputs are
    known-clean, switch to ``JsonlSource`` (Arrow C++ parser) for the
    data plane. ``.json`` files parse whole-file (multi-line documents;
    a top-level array becomes one row per element), ``.jsonl`` /
    ``.ndjson`` line-by-line; ``.gz`` is transparent for both."""

    paths: str | list[str]

    def _files(self) -> list[str]:
        return sorted([self.paths] if isinstance(self.paths, str)
                      else list(self.paths))

    @staticmethod
    def _scan_file(path: str) -> tuple[list[dict], list[dict]]:
        import gzip
        import json as _json

        opener = gzip.open if path.endswith(".gz") else open
        stem = path[:-3] if path.endswith(".gz") else path
        docs: list[dict] = []
        errs: list[dict] = []
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            if stem.endswith(".json"):  # whole-file document
                text = f.read()
                try:
                    doc = _json.loads(text)
                    docs.extend(doc if isinstance(doc, list) else [doc])
                except _json.JSONDecodeError as e:
                    errs.append({"path": path, "line": e.lineno,
                                 "col": e.colno, "message": e.msg})
            else:  # JSONL: one document per line
                for i, line in enumerate(f, 1):
                    if not line.strip():
                        continue
                    try:
                        docs.append(_json.loads(line))
                    except _json.JSONDecodeError as e:
                        errs.append({"path": path, "line": i,
                                     "col": e.colno, "message": e.msg})
        return docs, errs

    def errors(self):
        import ray.data as rd

        return rd.from_items(self._files()).flat_map(
            lambda r: JsonlCheckedSource._scan_file(r["item"])[1])

    def dataset(self, columns: Sequence[str] | None = None):
        import ray.data as rd

        ds = rd.from_items(self._files()).flat_map(
            lambda r: JsonlCheckedSource._scan_file(r["item"])[0])
        if columns:
            ds = ds.select_columns(list(columns))
        return ds


@dataclass
class YamlSource(DocSource):
    """YAML documents, multi-doc streams included — the reference reads
    ``.yaml``/``.yml`` schema and instance files via ``--yaml``
    (``/root/reference/src/input.h:339-399``). Parsing is driver-side
    per FILE (YAML is a config-scale format: schemas, suites, manifests
    — never the 100 TB data plane), then handed to Ray as Arrow rows;
    a directory of YAML files parses in parallel via ``flat_map`` over
    the file list."""

    paths: str | list[str]

    @staticmethod
    def _parse_file(path: str) -> list[dict]:
        import yaml

        with open(path) as f:
            return [d for d in yaml.safe_load_all(f) if d is not None]

    def _files(self) -> list[str]:
        import glob
        import os

        paths = [self.paths] if isinstance(self.paths, str) else list(self.paths)
        out: list[str] = []
        for p in paths:
            if os.path.isdir(p):
                out.extend(sorted(
                    glob.glob(os.path.join(p, "**", "*.y*ml"), recursive=True)))
            else:
                out.extend(sorted(glob.glob(p)) or [p])
        return out

    def dataset(self, columns: Sequence[str] | None = None):
        import ray.data as rd

        files = self._files()
        ds = rd.from_items(files).flat_map(
            lambda row: YamlSource._parse_file(row["item"]))
        if columns:
            ds = ds.map_batches(
                lambda t: t.select([c for c in columns
                                    if c in t.schema.names]),
                batch_format="pyarrow")
        return ds


@dataclass
class DatasetSource(DocSource):
    """Wrap an existing Dataset (tests / already-built pipelines).

    Column pruning degrades to ``select_columns`` — rows are already
    materialized upstream, so prefer Parquet/Lance sources at scale.
    """

    ds: object

    def dataset(self, columns: Sequence[str] | None = None):
        if columns:
            keep = [c for c in columns if c in self.ds.schema().names]
            return self.ds.select_columns(keep)
        return self.ds


@dataclass
class SynthSource(DocSource):
    """Deterministic generated docs (bench / large-scale tests): each
    consumption regenerates identical rows in parallel — no disk."""

    cfg: object  # GenConfig
    override_num_blocks: int | None = None

    def dataset(self, columns: Sequence[str] | None = None):
        from jsonschema_ray.sources.synth import docs_dataset

        return docs_dataset(self.cfg,
                            override_num_blocks=self.override_num_blocks,
                            columns=list(columns) if columns else None)


def as_source(obj) -> DocSource:
    import pyarrow as pa

    if isinstance(obj, DocSource):
        return obj
    if isinstance(obj, (str, list)):
        return ParquetSource(obj)
    if isinstance(obj, pa.Table):  # tests / small in-memory inputs
        import ray.data as rd

        return DatasetSource(rd.from_arrow(obj))
    return DatasetSource(obj)
