"""Column statistics / HLL distinct / t-digest drift checks.

North-rule ``stats`` and ``drift`` rule kinds (SURVEY.md §2.5): exact
count / null-rate / min / max plus HLL distinct estimates and t-digest
quantiles per profiled column, computed as **mergeable per-block
partials** inside ``map_batches`` and tree-reduced — the data itself is
never shuffled; only one small sketch row per (block, column) moves.

Span-struct fields are addressed as ``spans.<field>`` and profiled over
the flattened span table (one observation per span).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsonschema_ray.functions.listops import flatten_spans
from jsonschema_ray.functions.sketches import HyperLogLog, TDigest, hash64, quantile_drift
from jsonschema_ray.sources.readers import as_source

PARTIAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("count", pa.int64()),
    ("nulls", pa.int64()),
    ("vmin_num", pa.float64()),
    ("vmax_num", pa.float64()),
    ("vmin_str", pa.string()),
    ("vmax_str", pa.string()),
    ("hll", pa.binary()),
    ("tdigest", pa.binary()),
])


@dataclass
class ProfileSpec:
    """What to profile for one (possibly span-nested) column."""

    column: str                      # "doc_id" or "spans.offset"
    hll: bool = True                 # distinct estimate
    tdigest: bool = False            # numeric quantiles (drift input)
    hash_fn: str = "fast"            # "fast" (pandas hash64) or "md5"
    #   "md5" == DuckDB md5_number_lower: slower, but makes the HLL
    #   registers bit-reproducible in SQL (cross-engine certificate)


def _resolve_columns(specs: Sequence[ProfileSpec]) -> list[str]:
    """Physical top-level columns needed (for the pruned read)."""
    cols = set()
    for s in specs:
        cols.add(s.column.split(".", 1)[0])
    return sorted(cols)


class ProfilePartial:
    """Actor stage: one sketch row per (batch, profiled column)."""

    def __init__(self, specs: list[dict], spans_col: str = "spans"):
        self.specs = [ProfileSpec(**s) for s in specs]
        self.spans_col = spans_col

    def _observe(self, name: str, arr: pa.Array, spec: ProfileSpec) -> dict:
        n = len(arr)
        nulls = int(pc.count(arr, mode="only_null").as_py() or 0)
        valid = arr.drop_null()
        row: dict[str, Any] = {
            "column": name, "count": n, "nulls": nulls,
            "vmin_num": None, "vmax_num": None,
            "vmin_str": None, "vmax_str": None,
            "hll": None, "tdigest": None,
        }
        is_num = pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)
        if len(valid):
            mm = pc.min_max(valid)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if is_num:
                row["vmin_num"], row["vmax_num"] = float(lo), float(hi)
            else:
                row["vmin_str"], row["vmax_str"] = str(lo), str(hi)
        if spec.hll and len(valid):
            from jsonschema_ray.functions.sketches import md5_hash64

            h = HyperLogLog()
            vals = valid.to_numpy(zero_copy_only=False)
            hf = md5_hash64 if spec.hash_fn == "md5" else hash64
            h.add_hashes(hf(vals if vals.dtype != object
                            else vals.astype(object)))
            row["hll"] = h.serialize()
        if spec.tdigest and is_num and len(valid):
            td = TDigest()
            td.add(valid.to_numpy(zero_copy_only=False).astype(np.float64))
            row["tdigest"] = td.serialize()
        return row

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = None
        rows = []
        for spec in self.specs:
            if "." in spec.column:
                top, sub = spec.column.split(".", 1)
                if flat is None:
                    flat, _, _ = flatten_spans(batch, top)
                arr = flat.column(sub)
            else:
                arr = batch.column(spec.column)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            rows.append(self._observe(spec.column, arr, spec))
        return pa.Table.from_pylist(rows, schema=PARTIAL_SCHEMA)


def _merge_rows(t: pa.Table) -> pa.Table:
    """Merge all partial rows of one column group into one."""
    rows = t.to_pylist()
    if not rows:
        return PARTIAL_SCHEMA.empty_table()
    out = dict(rows[0])
    hll = HyperLogLog.deserialize(out["hll"]) if out["hll"] else None
    td = TDigest.deserialize(out["tdigest"]) if out["tdigest"] else None
    for r in rows[1:]:
        out["count"] += r["count"]
        out["nulls"] += r["nulls"]
        for k, f in (("vmin_num", min), ("vmax_num", max),
                     ("vmin_str", min), ("vmax_str", max)):
            a, b = out[k], r[k]
            out[k] = f(a, b) if a is not None and b is not None else (a if b is None else b)
        if r["hll"]:
            other = HyperLogLog.deserialize(r["hll"])
            hll = other if hll is None else hll.merge(other)
        if r["tdigest"]:
            other = TDigest.deserialize(r["tdigest"])
            td = other if td is None else td.merge(other)
    out["hll"] = hll.serialize() if hll else None
    out["tdigest"] = td.serialize() if td else None
    return pa.Table.from_pylist([out], schema=PARTIAL_SCHEMA)


def profile(
    source: Any,
    specs: Sequence[ProfileSpec | dict],
    *,
    batch_size: int = 16384,
    concurrency: int | tuple[int, int] | None = None,
) -> dict[str, dict[str, Any]]:
    """Compute the column profile. Returns {column: profile dict}.

    Two-level tree merge: block partials → ``width`` block-local
    pre-merges (sketch merge is associative, so no key shuffle is
    needed — ``repartition(width)`` then merge-within-block) → final
    per-column merge. At 10^12 docs the final merge sees at most
    ``width`` rows per column, and no stage sorts.
    """
    specs = [s if isinstance(s, ProfileSpec) else ProfileSpec(**s) for s in specs]
    src = as_source(source)
    ds = src.dataset(columns=_resolve_columns(specs))
    if concurrency is None:
        # stateless tasks: sketch stages hold no heavy state, and tasks
        # scale elastically with the cluster (an actor pool caps width)
        stage = ProfilePartial([vars(s) for s in specs])
        partials = ds.map_batches(stage.__call__, batch_format="pyarrow",
                                  batch_size=batch_size)
    else:
        partials = ds.map_batches(
            ProfilePartial,
            fn_constructor_kwargs={"specs": [vars(s) for s in specs]},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency,
        )

    # Pre-merge per column across partial blocks.  Merging is
    # associative+commutative, so no key co-location is needed:
    # StreamingRepartition (target_num_rows_per_block) coalesces the
    # tiny per-block partial tables into ~8192-row blocks WITHOUT a
    # barrier — and unlike block-count Repartition it never emits
    # zero-schema empty bundles (the source of the "new schema: ."
    # executor warnings; MapBatches forwards empty bundles without
    # calling the UDF, so guards inside the UDF can't help).
    # 8192 partial rows/block → ≤ n_cols rows out per block, so the
    # driver-side fold below sees ~n_cols × n_partials/8192 rows — a
    # few thousand at 10^12 docs, scalars not data.
    def _merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "column" not in t.column_names:
            return PARTIAL_SCHEMA.empty_table()
        parts = [_merge_rows(t.filter(pc.equal(t.column("column"), c)))
                 for c in sorted(set(t.column("column").to_pylist()))]
        return pa.concat_tables(parts)

    level1 = partials.repartition(target_num_rows_per_block=8192) \
        .map_batches(_merge_block, batch_format="pyarrow", batch_size=None)

    pre = pa.Table.from_pylist(level1.take_all(), schema=PARTIAL_SCHEMA)
    final = _merge_block(pre)

    out: dict[str, dict[str, Any]] = {}
    for row in final.to_pylist():  # one row per profiled column
        col = row["column"]
        hll = HyperLogLog.deserialize(row["hll"]) if row["hll"] else None
        td = TDigest.deserialize(row["tdigest"]) if row["tdigest"] else None
        out[col] = {
            "count": int(row["count"]),
            "nulls": int(row["nulls"]),
            "null_rate": (row["nulls"] / row["count"]) if row["count"] else 0.0,
            "min": row["vmin_num"] if row["vmin_num"] is not None else row["vmin_str"],
            "max": row["vmax_num"] if row["vmax_num"] is not None else row["vmax_str"],
            "distinct_est": hll.estimate() if hll else None,
            "hll": row["hll"].hex() if row["hll"] else None,
            "tdigest": row["tdigest"].hex() if row["tdigest"] else None,
        }
    return out


@dataclass
class StatsBounds:
    """A ``stats`` rule's acceptance bounds for one column."""

    column: str
    max_null_rate: float | None = None
    min_value: float | None = None
    max_value: float | None = None
    distinct_min: float | None = None
    distinct_max: float | None = None


def check_stats(profile_out: dict[str, dict], bounds: Sequence[StatsBounds | dict]
                ) -> list[dict[str, Any]]:
    """Evaluate stats bounds → violation dicts (dataset-scope:
    doc_id carries ``column:<name>``, span_index = -1)."""
    violations = []
    for b in bounds:
        if isinstance(b, dict):
            b = StatsBounds(**b)
        p = profile_out.get(b.column)
        if p is None:
            continue
        def emit(msg):
            violations.append({"doc_id": f"column:{b.column}",
                               "rule_id": "stats_bounds",
                               "span_index": -1, "message": msg})
        if b.max_null_rate is not None and p["null_rate"] > b.max_null_rate:
            emit(f"null_rate {p['null_rate']:.4f} > {b.max_null_rate}")
        if b.min_value is not None and p["min"] is not None and p["min"] < b.min_value:
            emit(f"min {p['min']} < {b.min_value}")
        if b.max_value is not None and p["max"] is not None and p["max"] > b.max_value:
            emit(f"max {p['max']} > {b.max_value}")
        if b.distinct_min is not None and (p["distinct_est"] or 0) < b.distinct_min:
            emit(f"distinct≈{p['distinct_est']:.0f} < {b.distinct_min}")
        if b.distinct_max is not None and (p["distinct_est"] or 0) > b.distinct_max:
            emit(f"distinct≈{p['distinct_est']:.0f} > {b.distinct_max}")
    return violations


def check_drift(profile_out: dict[str, dict], baseline: dict[str, dict],
                tolerance: float = 0.1) -> list[dict[str, Any]]:
    """``drift`` rule: t-digest quantile displacement vs a stored
    baseline profile (state/profile.py) beyond tolerance ⇒ violation."""
    violations = []
    for col, base in baseline.items():
        cur = profile_out.get(col)
        if not cur or not base.get("tdigest") or not cur.get("tdigest"):
            continue
        d = quantile_drift(TDigest.deserialize(bytes.fromhex(base["tdigest"])),
                           TDigest.deserialize(bytes.fromhex(cur["tdigest"])))
        if d > tolerance:
            violations.append({
                "doc_id": f"column:{col}", "rule_id": "distribution_drift",
                "span_index": -1,
                "message": f"quantile drift {d:.4f} > tolerance {tolerance}",
            })
    return violations
