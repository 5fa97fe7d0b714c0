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


# ---------------------------------------------------------------------------
# Exact distributed quantiles — selection WITHOUT a global sort.
# ---------------------------------------------------------------------------

def _quantile_select(
    ds,
    column: str,
    key_col: str | None,
    qs: Sequence[float],
    *,
    bins: int,
    collect_cap: int,
    batch_size: int,
    max_iters: int,
    max_groups: int,
):
    """Shared engine for ``exact_quantiles`` / ``exact_quantiles_by``:
    iterative histogram narrowing (distributed selection).

      pass 0  — per-batch, per-group (count, min, max) partials;
      iterate — ONE streaming pass per round computes a ``bins``-bucket
                histogram for EVERY still-unresolved (group, quantile)
                interval simultaneously; only thin nonzero
                (interval, bucket, count) rows move, never data; the
                driver holds a J×bins count matrix and narrows each
                interval to the bucket containing its target rank;
      finish  — intervals holding ≤ ``collect_cap`` values resolve via
                one bounded collect pass + ``np.partition``.

    Rank semantics match DuckDB ``quantile_disc``: the answer IS the
    column element at 0-based sorted index ``max(ceil(q·n)−1, 0)``
    among the group's non-null values — bit-exact cross-engine, no
    interpolation arithmetic on either side.  NaNs are excluded like
    nulls.  Values are bucketed through float64 (exact for doubles and
    integers < 2^53).  Returns {group_key: [(q, value|None), ...]};
    the global variant uses the single group key ``None``.
    """
    qs = [float(q) for q in qs]

    def _group_values(batch: pa.Table):
        """[(key, float64 values)] for groups present in the batch —
        one np.unique factorize, no per-row Python."""
        arr = batch.column(column)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        ok = ~np.isnan(v)
        if arr.null_count:
            ok &= arr.is_valid().to_numpy(zero_copy_only=False)
        if key_col is None:
            return [(None, v[ok])]
        k = batch.column(key_col)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        kv = k.to_numpy(zero_copy_only=False)
        if k.null_count:
            ok &= k.is_valid().to_numpy(zero_copy_only=False)
        kv, v = kv[ok], v[ok]
        uk, inv = np.unique(kv, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uk) + 1))
        sv = v[order]
        return [(uk[g], sv[bounds[g]:bounds[g + 1]])
                for g in range(len(uk))]

    def _cmm(batch: pa.Table) -> pa.Table:
        ks, ns, los, his = [], [], [], []
        for k, v in _group_values(batch):
            ks.append("" if k is None else str(k))
            ns.append(len(v))
            los.append(float(v.min()) if len(v) else None)
            his.append(float(v.max()) if len(v) else None)
        return pa.table({"k": pa.array(ks, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "lo": pa.array(los, pa.float64()),
                         "hi": pa.array(his, pa.float64())})

    gstat: dict[str, list] = {}
    for p in ds.map_batches(_cmm, batch_format="pyarrow",
                            batch_size=batch_size).take_all():
        s = gstat.setdefault(p["k"], [0, np.inf, -np.inf])
        s[0] += p["n"]
        if p["lo"] is not None:
            s[1] = min(s[1], p["lo"])
            s[2] = max(s[2], p["hi"])
    gstat = {k: s for k, s in gstat.items() if s[0] > 0}
    if len(gstat) > max_groups:
        raise ValueError(
            f"exact quantiles: {len(gstat)} groups exceeds max_groups="
            f"{max_groups}; driver state is O(groups × quantiles) — "
            "use a t-digest profile for high-cardinality keys")
    groups = sorted(gstat)

    # flat interval state: J = groups × quantiles
    J = len(groups) * len(qs)
    g_of = np.repeat(np.arange(len(groups)), len(qs))
    q_of = np.tile(np.arange(len(qs)), len(groups))
    rank = np.empty(J, dtype=np.int64)
    lo = np.empty(J)
    hi = np.empty(J)
    cnt = np.empty(J, dtype=np.int64)
    for i in range(J):
        n, glo, ghi = gstat[groups[g_of[i]]]
        rank[i] = min(max(int(np.ceil(qs[q_of[i]] * n)) - 1, 0), n - 1)
        lo[i], hi[i], cnt[i] = glo, ghi, n
    val = np.full(J, np.nan)
    done = np.zeros(J, dtype=bool)

    key_str = (lambda k: "" if k is None else str(k))

    for _ in range(max_iters):
        for j in np.flatnonzero(~done):
            if lo[j] >= hi[j]:
                val[j], done[j] = lo[j], True
        if done.all():
            break

        small = np.flatnonzero(~done & (cnt <= collect_cap))
        if len(small):
            # group key → [(interval id, lo, hi)]
            per_g: dict[str, list] = {}
            for j in small:
                per_g.setdefault(groups[g_of[j]], []).append(
                    (int(j), float(lo[j]), float(hi[j])))

            def _collect(batch: pa.Table, _per_g=per_g) -> pa.Table:
                iv_out, val_out = [], []
                for k, v in _group_values(batch):
                    for j, l, h in _per_g.get(key_str(k), ()):
                        m = v[(v >= l) & (v <= h)]
                        if len(m):
                            iv_out.append(np.full(len(m), j, np.int32))
                            val_out.append(m)
                if not iv_out:
                    return pa.table({"iv": pa.array([], pa.int32()),
                                     "v": pa.array([], pa.float64())})
                return pa.table({"iv": pa.array(np.concatenate(iv_out)),
                                 "v": pa.array(np.concatenate(val_out))})

            by_iv: dict[int, list] = {int(j): [] for j in small}
            for r in ds.map_batches(_collect, batch_format="pyarrow",
                                    batch_size=batch_size).take_all():
                by_iv[int(r["iv"])].append(r["v"])
            for j in small:
                vals = np.asarray(by_iv[int(j)])
                if len(vals) != cnt[j]:   # pragma: no cover - invariant
                    raise RuntimeError(
                        f"quantile collect mismatch: {len(vals)} != {cnt[j]}")
                r = int(rank[j])
                val[j] = float(np.partition(vals, r)[r])
                done[j] = True

        big = np.flatnonzero(~done)
        if not len(big):
            continue
        edges = {int(j): np.linspace(lo[j], hi[j], bins + 1) for j in big}
        hist_g: dict[str, list] = {}
        for j in big:
            hist_g.setdefault(groups[g_of[j]], []).append(int(j))

        def _hist(batch: pa.Table, _hg=hist_g, _edges=edges) -> pa.Table:
            iv_out, b_out, c_out = [], [], []
            for k, v in _group_values(batch):
                for j in _hg.get(key_str(k), ()):
                    e = _edges[j]
                    m = v[(v >= e[0]) & (v <= e[-1])]
                    if not len(m):
                        continue
                    idx = np.searchsorted(e[1:-1], m, side="right")
                    bc = np.bincount(idx, minlength=bins)
                    nz = np.flatnonzero(bc)
                    iv_out.append(np.full(len(nz), j, np.int32))
                    b_out.append(nz.astype(np.int32))
                    c_out.append(bc[nz])
            if not iv_out:
                return pa.table({"iv": pa.array([], pa.int32()),
                                 "b": pa.array([], pa.int32()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({"iv": pa.array(np.concatenate(iv_out)),
                             "b": pa.array(np.concatenate(b_out)),
                             "c": pa.array(np.concatenate(c_out))})

        def _sum_block(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "iv" not in t.column_names:
                return pa.table({"iv": pa.array([], pa.int32()),
                                 "b": pa.array([], pa.int32()),
                                 "c": pa.array([], pa.int64())})
            key = (t.column("iv").to_numpy().astype(np.int64) * (bins + 1)
                   + t.column("b").to_numpy())
            c = t.column("c").to_numpy()
            uk, inv = np.unique(key, return_inverse=True)
            sums = np.bincount(inv, weights=c).astype(np.int64)
            return pa.table(
                {"iv": pa.array((uk // (bins + 1)).astype(np.int32)),
                 "b": pa.array((uk % (bins + 1)).astype(np.int32)),
                 "c": pa.array(sums)})

        # thin partial rows → coalesce without a barrier → driver holds
        # only the J×bins matrix, never data
        hrows = (ds.map_batches(_hist, batch_format="pyarrow",
                                batch_size=batch_size)
                 .repartition(target_num_rows_per_block=64 * 1024)
                 .map_batches(_sum_block, batch_format="pyarrow",
                              batch_size=None)
                 .take_all())
        mat = {int(j): np.zeros(bins, dtype=np.int64) for j in big}
        for r in hrows:
            mat[int(r["iv"])][int(r["b"])] += int(r["c"])
        for j in big:
            counts = mat[int(j)]
            if int(counts.sum()) != cnt[j]:   # pragma: no cover - invariant
                raise RuntimeError(
                    f"quantile histogram mismatch: {counts.sum()} != {cnt[j]}")
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, rank[j], side="right"))
            below = int(cum[b - 1]) if b else 0
            e = edges[int(j)]
            nlo = float(e[b])
            nhi = float(hi[j]) if b == bins - 1 \
                else float(np.nextafter(e[b + 1], -np.inf))
            rank[j] -= below
            cnt[j] = int(counts[b])
            if nhi <= nlo:
                val[j], done[j] = nlo, True
            else:
                lo[j], hi[j] = nlo, nhi
    else:   # pragma: no cover - 4096^64 dynamic range is unreachable
        raise RuntimeError("exact quantiles failed to converge")

    out: dict[str, list] = {g: [] for g in groups}
    for i in range(J):
        out[groups[g_of[i]]].append((qs[q_of[i]], float(val[i])))
    return out


def exact_quantiles(
    source: Any,
    column: str,
    qs: Sequence[float],
    *,
    bins: int = 4096,
    collect_cap: int = 1 << 16,
    batch_size: int = 64 * 1024,
    max_iters: int = 64,
) -> pa.Table:
    """Exact order statistics over a numeric column WITHOUT a global
    sort — see ``_quantile_select``.  For uniform-ish data one
    histogram round cuts the candidate count by ``bins``×, so a
    10^12-row column resolves in ~3-4 streaming passes total, vs
    ``Dataset.sort`` moving every block through an all-to-all
    exchange.  All quantiles share every pass.

    Returns a pyarrow Table (q: float64, value: float64) ordered by q.
    """
    src = as_source(source)
    ds = src.dataset(columns=[column.split(".", 1)[0]])
    res = _quantile_select(ds, column, None, qs, bins=bins,
                           collect_cap=collect_cap, batch_size=batch_size,
                           max_iters=max_iters, max_groups=1)
    qs_sorted = sorted(float(q) for q in qs)
    if not res:    # empty input
        return pa.table({"q": pa.array(qs_sorted, pa.float64()),
                         "value": pa.array([None] * len(qs_sorted),
                                           pa.float64())})
    pairs = sorted(res[""])
    return pa.table({"q": pa.array([p[0] for p in pairs], pa.float64()),
                     "value": pa.array([p[1] for p in pairs], pa.float64())})


def exact_quantiles_by(
    source: Any,
    key: str,
    column: str,
    qs: Sequence[float],
    *,
    bins: int = 4096,
    collect_cap: int = 1 << 16,
    batch_size: int = 64 * 1024,
    max_iters: int = 64,
    max_groups: int = 100_000,
) -> pa.Table:
    """Per-group exact quantiles (GROUP BY + quantile_disc semantics)
    WITHOUT sorting or shuffling the data: every streaming pass serves
    ALL (group, quantile) intervals at once, so the pass count stays
    ~3-4 regardless of group count.  Driver state is
    O(groups × quantiles) scalars — bounded by ``max_groups`` (use the
    t-digest profile for high-cardinality keys instead).

    Returns a pyarrow Table (key: string, q: float64, value: float64)
    ordered by (key, q).
    """
    src = as_source(source)
    cols = sorted({key.split(".", 1)[0], column.split(".", 1)[0]})
    ds = src.dataset(columns=cols)
    res = _quantile_select(ds, column, key, qs, bins=bins,
                           collect_cap=collect_cap, batch_size=batch_size,
                           max_iters=max_iters, max_groups=max_groups)
    ks, qv, vv = [], [], []
    for g in sorted(res):
        for q, v in sorted(res[g]):
            ks.append(g)
            qv.append(q)
            vv.append(v)
    return pa.table({key: pa.array(ks, pa.string()),
                     "q": pa.array(qv, pa.float64()),
                     "value": pa.array(vv, pa.float64())})


# ---------------------------------------------------------------------------
# Distribution drift between two cohorts: PSI (binned) and exact KS.
# ---------------------------------------------------------------------------

def psi_drift(source: Any, value_col: str, key_col: str,
              n_bins: int = 10, modulus: int = 2) -> pa.Table:
    """Population Stability Index between two deterministic cohorts of
    one table (baseline = ``key % modulus == 0``, current = the rest)
    over equal-width bins of ``value_col`` — the classic production
    drift monitor (PSI > 0.2 ⇒ investigate).

    Two streaming passes, no shuffle of the data itself:

    1. global min/max (Arrow aggregate);
    2. per-batch ``np.bincount`` partials per cohort → tiny
       ``groupby(bin).sum`` (≤ ``n_bins`` rows per block leave the
       node).

    PSI contributions use Laplace-smoothed shares
    ``p = (n + 0.5) / (N + n_bins/2)`` so empty bins stay finite, and
    are quantized to ``floor(1e6·x + 0.5)`` integers (same libm log as
    DuckDB) for an exact driver hash.

    → (bin, base_n, cur_n, psi_q) ordered by bin.
    """
    import math

    from ray.data.aggregate import Max, Min

    src = as_source(source)
    ds = src.dataset(columns=[key_col, value_col])

    lohi = ds.aggregate(Min(value_col), Max(value_col))
    lo = float(lohi[f"min({value_col})"])
    hi = float(lohi[f"max({value_col})"])
    span = hi - lo

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col)
        vals = t.column(value_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        mask = pc.and_(pc.is_valid(keys), pc.is_valid(vals)) \
            .to_numpy(zero_copy_only=False)
        k = keys.to_numpy(zero_copy_only=False)[mask]
        v = vals.to_numpy(zero_copy_only=False)[mask].astype(np.float64)
        if span > 0:
            b = np.floor((v - lo) / span * float(n_bins))
            b = np.clip(b, 0, n_bins - 1).astype(np.int64)
        else:
            b = np.zeros(len(v), np.int64)
        is_base = (k.astype(np.int64) % modulus) == 0
        nb = np.bincount(b[is_base], minlength=n_bins)
        nc = np.bincount(b[~is_base], minlength=n_bins)
        return pa.table({
            "bin": pa.array(np.arange(n_bins, dtype=np.int64)),
            "base_n": pa.array(nb.astype(np.int64)),
            "cur_n": pa.array(nc.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").sum(["base_n", "cur_n"])
    t = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in agg.iter_batches(batch_format="pyarrow")])
    t = t.sort_by("bin")
    nb = t.column("sum(base_n)").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nc = t.column("sum(cur_n)").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    tot_b, tot_c = int(nb.sum()), int(nc.sum())
    q = np.zeros(len(nb), np.int64)
    for i in range(len(nb)):
        pb = (nb[i] + 0.5) / (tot_b + n_bins * 0.5)
        pcur = (nc[i] + 0.5) / (tot_c + n_bins * 0.5)
        q[i] = math.floor(1e6 * ((pcur - pb) * math.log(pcur / pb)) + 0.5)
    return pa.table({
        "bin": t.column("bin").to_numpy(zero_copy_only=False)
            .astype(np.int64),
        "base_n": nb, "cur_n": nc, "psi_q": q})


def ks_drift(source: Any, value_col: str, key_col: str,
             modulus: int = 2) -> pa.Table:
    """EXACT two-sample Kolmogorov–Smirnov statistic between the same
    two cohorts, computed in integer arithmetic so the result is
    bit-reproducible in SQL:

    ``D = max over distinct v of |CB(v)·NC − CC(v)·NB| / (NB·NC)``

    Pipeline: per-batch (value, nb, nc) collapse → distributed
    ``groupby(value).sum`` → range ``sort(value)`` → ONE summary row
    per sorted block.  The key identity: within a block the ECDF gap is
    ``prefix + f_i`` with ``f_i`` the block-local integer gap, so the
    block max is reached at ``max f_i`` or ``min f_i`` — each block
    ships 5 scalars and the driver combines O(#blocks) summaries
    (ordered by block min value; blocks are range-partitioned so that
    order is the value order, and distinct values never straddle the
    collapse).  int64 is exact while both cohort counts stay < 2^31
    (≈2.1 G rows per side); beyond that the per-block cumsums need the
    int128 path (documented, not needed at sandbox scale).

    → one row (nb, nc, ks_num, ks_q) with ``ks_q = floor(1e6·D+0.5)``.
    """
    import math

    from ray.data.aggregate import Sum

    src = as_source(source)
    ds = src.dataset(columns=[key_col, value_col])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        keys = t.column(key_col)
        vals = t.column(value_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        mask = pc.and_(pc.is_valid(keys), pc.is_valid(vals)) \
            .to_numpy(zero_copy_only=False)
        k = keys.to_numpy(zero_copy_only=False)[mask].astype(np.int64)
        v = vals.to_numpy(zero_copy_only=False)[mask].astype(np.float64)
        base = ((k % modulus) == 0).astype(np.int64)
        df = pd.DataFrame({"value": v, "nb": base, "nc": 1 - base}) \
            .groupby("value", sort=False).sum().reset_index()
        return pa.table({"value": pa.array(df["value"].to_numpy()),
                         "nb": pa.array(df["nb"].to_numpy(np.int64)),
                         "nc": pa.array(df["nc"].to_numpy(np.int64))})

    from jsonschema_ray.stages.hashagg import hash_group_agg

    grouped = hash_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"), "value",
        {"sum(nb)": ("nb", "sum"), "sum(nc)": ("nc", "sum")}).materialize()
    tot = grouped.aggregate(Sum("sum(nb)"), Sum("sum(nc)"))
    NB = int(tot["sum(sum(nb))"] or 0)
    NC = int(tot["sum(sum(nc))"] or 0)
    if NB == 0 or NC == 0:
        return pa.table({"nb": pa.array([NB], pa.int64()),
                         "nc": pa.array([NC], pa.int64()),
                         "ks_num": pa.array([0], pa.int64()),
                         "ks_q": pa.array([0], pa.int64())})

    def summarize(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        nb = t.column("sum(nb)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nc = t.column("sum(nc)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if not len(v):
            return pa.table({"vmin": pa.array([], pa.float64()),
                             "tb": pa.array([], pa.int64()),
                             "tc": pa.array([], pa.int64()),
                             "fmax": pa.array([], pa.int64()),
                             "fmin": pa.array([], pa.int64())})
        # sort() range-partitions but the block itself is sorted too;
        # re-assert local order for safety (cheap on a block)
        o = np.argsort(v, kind="stable")
        nb, nc = nb[o], nc[o]
        f = np.cumsum(nb) * NC - np.cumsum(nc) * NB
        return pa.table({"vmin": pa.array([float(v.min())], pa.float64()),
                         "tb": pa.array([int(nb.sum())], pa.int64()),
                         "tc": pa.array([int(nc.sum())], pa.int64()),
                         "fmax": pa.array([int(f.max())], pa.int64()),
                         "fmin": pa.array([int(f.min())], pa.int64())})

    rows = grouped.sort("value").map_batches(
        summarize, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vmin"])
    ks_num = 0
    pb = pcur = 0
    for r in rows:
        c = pb * NC - pcur * NB
        ks_num = max(ks_num, abs(c + r["fmax"]), abs(c + r["fmin"]))
        pb += r["tb"]
        pcur += r["tc"]
    ks_q = math.floor(1e6 * (ks_num / (NB * NC)) + 0.5)
    return pa.table({"nb": pa.array([NB], pa.int64()),
                     "nc": pa.array([NC], pa.int64()),
                     "ks_num": pa.array([ks_num], pa.int64()),
                     "ks_q": pa.array([ks_q], pa.int64())})


def zscore_outliers(source: Any, value_col: str, group_col: str,
                    threshold: float = 2.0, id_col: str | None = None
                    ) -> "Any":
    """Per-group standardization + outlier flagging: two passes —

    1. per-group moments as EXACT integer sums of cent-scaled values
       (``v_c = floor(100·v + 0.5)``): per-batch (group, n, sum_c,
       sumsq_c) partials → small distributed groupby (one row per
       group) — deterministic under any merge order, unlike float
       accumulation;
    2. broadcast the tiny moments table; flag rows with
       ``|v_c − mean| / sqrt(var)| > threshold`` per batch (zero
       shuffle), emitting the quantized z ``floor(1e4·z + 0.5)``.

    Groups are low-cardinality dimensions (event types, sources); a
    high-cardinality group key would use the same partials with a
    broadcast-join tier like the referential checks.
    → (id, group, value_c, z_q) for flagged rows only.
    """
    import ray

    src = as_source(source)
    cols = [c for c in {value_col, group_col, id_col} if c]
    ds = src.dataset(columns=sorted(cols))

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        g = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = ~pd.isna(g) & ~np.isnan(v)
        vc = np.floor(100.0 * v[ok] + 0.5).astype(np.int64)
        df = pd.DataFrame({"g": g[ok], "n": 1, "s": vc, "ss": vc * vc}) \
            .groupby("g", sort=False).sum().reset_index()
        return pa.table({group_col: pa.array(df["g"], pa.string()),
                         "n": pa.array(df["n"].to_numpy(np.int64)),
                         "s": pa.array(df["s"].to_numpy(np.int64)),
                         "ss": pa.array(df["ss"].to_numpy(np.int64))})

    mom = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).sum(["n", "s", "ss"]).take_all()
    stats = {}
    for r in mom:
        n, s, ss = int(r["sum(n)"]), int(r["sum(s)"]), int(r["sum(ss)"])
        mean = s / n
        var = ss / n - mean * mean
        stats[r[group_col]] = (mean, var)
    ref = ray.put(stats)

    def flag(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        vc = np.floor(100.0 * v + 0.5)
        gobj = g.astype(object)
        valid_g = np.array([x is not None for x in gobj], dtype=bool)
        gx = np.where(valid_g, gobj, "")      # sentinel for unique()
        uniq, inv = np.unique(gx.astype(object), return_inverse=True)
        mean = np.array([st.get(u, (0.0, 0.0))[0] for u in uniq])[inv]
        var = np.array([st.get(u, (0.0, 1.0))[1] for u in uniq])[inv]
        sd = np.sqrt(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (vc - mean) / sd
        keep = np.abs(z) > threshold
        keep &= np.isfinite(z)
        # null group / null value rows are outside the cohort entirely
        keep &= valid_g
        keep &= ~np.isnan(v)
        cols_out = {}
        if id_col:
            ids = t.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            cols_out[id_col] = ids.filter(pa.array(keep))
        cols_out[group_col] = pa.array(g[keep], pa.string())
        cols_out["value_c"] = pa.array(vc[keep].astype(np.int64))
        cols_out["z_q"] = pa.array(
            np.floor(1e4 * z[keep] + 0.5).astype(np.int64))
        return pa.table(cols_out)

    return ds.map_batches(flag, batch_format="pyarrow")
