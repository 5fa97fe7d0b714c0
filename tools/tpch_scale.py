"""TPC-H fixed-cost crossover measurement.

The round-3 verdict's open question: at sf0.1 the Ray suite is ~24x
slower than in-process DuckDB because each all-to-all barrier carries
2-5 s of FIXED cost that dwarfs a 60 MB input — every query is shaped
for the regime where that cost amortizes, but no measurement showed
the crossover. This tool synthesizes a K-times-scaled corpus from
sf0.1 by key-shifted replication (facts only; dimensions stay fixed),
then times the full Ray suite and DuckDB on the SAME parquet at both
scales. Expected signature: Ray per-query time grows sub-linearly
(barrier cost amortizing) while DuckDB grows ~linearly.

Replication is deterministic and FK-preserving: copy i shifts
o_orderkey/l_orderkey by i*(max_orderkey+1) and c_custkey/o_custkey by
i*(max_custkey+1); l_partkey/l_suppkey reference the unscaled
dimensions. Output is partitioned parquet (one file per copy) so reads
parallelize and a re-run skips finished tables.

Usage:
    python tools/tpch_scale.py gen K [out_dir]
    python tools/tpch_scale.py bench SF_DIR [SF_DIR ...]
        [--queries q1_pricing_summary,...] [--skip-duckdb]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
DIM_TABLES = ["region", "nation", "part", "supplier"]
FACT_SHIFTS = {
    # table -> {column: key-space to shift by}
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey"},
    "customer": {"c_custkey": "custkey"},
}

# every registered TPC-H query (22/22)
SUITE = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_top_orders",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_type_profit",
    "q10_returned_items", "q11_important_stock", "q12_linestatus_priority",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_parts_supplier_relationship", "q17_small_quantity",
    "q18_large_orders", "q19_disjunctive_revenue", "q20_potential_promotion",
    "q21_waiting_supplier", "q22_dormant_customers",
]


def gen(k: int, out_dir: str, base: str = BASE) -> str:
    os.makedirs(out_dir, exist_ok=True)
    spaces = {
        "orderkey": int(pc.max(pq.read_table(
            f"{base}/orders.parquet",
            columns=["o_orderkey"]).column(0)).as_py()) + 1,
        "custkey": int(pc.max(pq.read_table(
            f"{base}/customer.parquet",
            columns=["c_custkey"]).column(0)).as_py()) + 1,
    }
    for t in DIM_TABLES:
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            pq.write_table(pq.read_table(f"{base}/{t}.parquet"), dst)
    for t, shifts in FACT_SHIFTS.items():
        ddir = f"{out_dir}/{t}.parquet"
        os.makedirs(ddir, exist_ok=True)
        src = pq.read_table(f"{base}/{t}.parquet")
        for i in range(k):
            dst = f"{ddir}/copy-{i:04d}.parquet"
            if os.path.exists(dst):
                continue
            tab = src
            for col, space in shifts.items():
                shifted = pc.add(tab.column(col),
                                 pa.scalar(i * spaces[space], pa.int64()))
                tab = tab.set_column(tab.schema.get_field_index(col),
                                     col, shifted)
            pq.write_table(tab, dst)
    print(f"generated x{k} at {out_dir}")
    return out_dir


def _duckdb_time(sf_dir: str, names: list[str]) -> dict[str, float]:
    import duckdb

    from jsonschema_ray.pipelines.queries import ORACLE

    con = duckdb.connect()
    for t in DIM_TABLES + list(FACT_SHIFTS) + ["events", "documents",
                                               "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out = {}
    for name in names:
        t0 = time.perf_counter()
        con.execute(ORACLE[name]).fetchall()
        out[name] = round(time.perf_counter() - t0, 3)
    con.close()
    return out


def bench(sf_dirs: list[str], names: list[str],
          skip_duckdb: bool = False) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from jsonschema_ray.pipelines.queries import QUERIES

    def consume(res):
        if hasattr(res, "iter_batches"):
            for _ in res.iter_batches(batch_format="pyarrow"):
                pass
        return res

    results: dict = {}
    for sf_dir in sf_dirs:
        rows = pq.ParquetDataset(f"{sf_dir}/lineitem.parquet") \
            .read(columns=["l_orderkey"]).num_rows
        # warm the worker pool once so the first query doesn't carry
        # process-spawn cost
        consume(QUERIES["q6_forecast_revenue"](sf_dir))
        # min-of-2 per query (round-5, same convention as bench.py):
        # a single pass folds one-shot costs (hash-shuffle aggregator
        # actor startup, ~3-10 s) and the host's 30%+ contention band
        # into the growth ratio; the steady-state number is what the
        # crossover measures
        ray_t = {}
        for name in names:
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                consume(QUERIES[name](sf_dir))
                samples.append(round(time.perf_counter() - t0, 3))
            ray_t[name] = min(samples)
        entry = {"lineitem_rows": rows, "ray": ray_t,
                 "ray_total": round(sum(ray_t.values()), 2)}
        if not skip_duckdb:
            dk = _duckdb_time(sf_dir, names)
            entry["duckdb"] = dk
            entry["duckdb_total"] = round(sum(dk.values()), 2)
        results[sf_dir] = entry
        print(json.dumps({sf_dir: {k: v for k, v in entry.items()
                                   if k != "ray" and k != "duckdb"}}))
    return results


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "gen":
        k = int(args[1])
        out = args[2] if len(args) > 2 else f"/tmp/tpch_scale_x{k}"
        gen(k, out)
        return 0
    if args and args[0] == "bench":
        rest = args[1:]
        names = SUITE
        skip = "--skip-duckdb" in rest
        rest = [a for a in rest if a != "--skip-duckdb"]
        for i, a in enumerate(rest):
            if a == "--queries":
                names = rest[i + 1].split(",")
                rest = rest[:i] + rest[i + 2:]
                break
        res = bench(rest, names, skip_duckdb=skip)
        print(json.dumps(res, indent=1))
        return 0
    print(__doc__)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
