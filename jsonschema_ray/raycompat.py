"""Workarounds for Ray Data quirks that cannot be fixed at the UDF level.

Nothing here changes execution semantics — only log hygiene.
"""

from __future__ import annotations

import logging

_INSTALLED = False


class _EmptySchemaDivergenceFilter(logging.Filter):
    """Drop ONLY the cosmetic "RefBundle with a different schema …
    new schema: <empty>" executor warnings.

    When every block of a map task's input partition is empty, Ray
    builds a schema-less placeholder block and forwards it AROUND the
    UDF (``ray/data/_internal/planner/plan_udf_map_op.py:454-462`` —
    "For empty input blocks, we directly output them without calling
    the UDF … TODO(hchen): This workaround is because some all-to-all
    operators output empty blocks with no schema").  A UDF that
    returns ``schema.empty_table()`` therefore never sees these
    blocks and cannot restore their schema; any filter-like stage
    that empties a partition (a sorted bucket with no duplicates, a
    selective predicate) triggers the warning.  The blocks carry zero
    rows, so the divergence is harmless.  Real schema divergences
    (non-empty new schema) still warn.
    """

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        if "RefBundle with a different schema" not in msg:
            return True
        # an empty Arrow schema stringifies to "", an empty pandas one
        # to "PandasBlockSchema(names=[], types=[])"
        harmless = ("new schema: . This" in msg
                    or "new schema: PandasBlockSchema(names=[], types=[])"
                    in msg)
        return not harmless


# Null group keys break Ray's sort-based shuffle (block sort raises
# "'<' not supported between instances of 'NoneType' and 'str'"), so
# nullable grouping columns are filled with this high-codepoint
# sentinel before any groupby and restored/COALESCEd on the way out.
# \uffff sorts after every real string == SQL's NULLS LAST.
NULL_GROUP_KEY = "\uffff__null__"


def read_parquet_clean(paths, columns=None, **kw):
    """``ray.data.read_parquet`` with the ``b'pandas'`` schema metadata
    stripped at the source.

    pandas-written parquet carries a ``b'pandas'`` schema-metadata
    blob; ``hash(pa.Schema)`` raises ``unhashable type: 'dict'`` when
    metadata is present, which trips Ray's schema-dedup fast path
    (``transform_pyarrow.py:176-181`` — "Unsure if there are cases
    where schemas are NOT hashable") inside the read task and on every
    downstream exchange, logging a warning per task.  Passing an
    explicit metadata-free ``schema=`` makes every block of the
    pipeline metadata-free.  The metadata only serves pandas
    round-trip niceties the engine never uses."""
    import pyarrow as pa
    import pyarrow.dataset as pds
    import ray.data as rd

    # pyarrow.dataset accepts a dir OR a list of files, but not a list
    # containing dirs — resolve each element separately in that case
    if isinstance(paths, (list, tuple)):
        schema = pa.unify_schemas(
            [pds.dataset(p).schema.remove_metadata() for p in paths])
    else:
        schema = pds.dataset(paths).schema.remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(paths, schema=schema,
                           columns=list(columns) if columns else None,
                           **kw)


def guard_fsspec_http_import() -> None:
    """Make ``from fsspec.implementations.http import HTTPFileSystem``
    succeed deterministically when aiohttp is absent.

    Ray re-attempts that import on EVERY read
    (``ray/data/datasource/path_util.py:153`` —
    ``_is_http_filesystem`` runs inside ``_resolve_paths_and_
    filesystem``).  Single-threaded, the inner ``import aiohttp``
    fails with ``ModuleNotFoundError``, which Ray catches.  But when
    several DRIVER THREADS resolve datasets concurrently (a
    multi-query workload), the racing failed imports can observe the
    partially-initialized ``fsspec.implementations.http`` module and
    raise a plain ``ImportError`` ("cannot import name
    'HTTPFileSystem'") that ESCAPES Ray's handler and kills the read.

    Fix: seed ``sys.modules`` once with a stub module whose
    ``HTTPFileSystem`` is a fresh class no real filesystem object is
    an instance of — the import then always succeeds instantly and
    every ``isinstance`` check correctly returns False.  No-op when
    the real module imports (aiohttp available) AND when fsspec itself
    is absent (the plain ``ModuleNotFoundError`` is already
    race-free; stubbing would fabricate a package).  Idempotent.

    Contract (ADVICE r4): the stub is permanent for the process — if
    aiohttp were installed later in the same interpreter, ``http://``
    filesystem reads would still resolve to the stub. Nothing in this
    engine reads HTTP filesystems through fsspec; a process that needs
    them must not call this guard."""
    import sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa
        return
    except ImportError:
        pass
    try:
        import fsspec  # noqa: F401 — stub only patches an EXISTING fsspec
    except ImportError:
        return
    import types

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # noqa: N801 — mirrors the fsspec name
        """Stub: nothing is ever an instance of this class."""

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    try:
        import fsspec.implementations

        fsspec.implementations.http = mod
    except ImportError:
        pass


def quiet_empty_schema_warnings() -> None:
    """Install the empty-schema warning filter (idempotent; safe to
    call before ``ray.init`` — it only touches the Python logger)."""
    global _INSTALLED
    if _INSTALLED:
        return
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaDivergenceFilter())
    _INSTALLED = True
