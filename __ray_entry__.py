"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or anywhere in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from jsonschema_ray.raycompat import quiet_empty_schema_warnings

# Log hygiene only (no execution-semantics change; safe pre-ray.init):
# suppress Ray's cosmetic empty-schema divergence warnings — see
# jsonschema_ray/raycompat.py for the Ray-internal cause.
quiet_empty_schema_warnings()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the CheckPlan
    span-validation family over an interleaved table derived from the
    documents table (plus the synthetic full-plan run via queries()).
    Returns the violations dataset."""
    from jsonschema_ray.pipelines.queries import q_val_spans_documents

    return q_val_spans_documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (+ the training-data ops). See jsonschema_ray/pipelines/queries.py."""
    from jsonschema_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    entries (approximate/heuristic/synthetic ops) are omitted."""
    from jsonschema_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
