"""Paired x1/x10 scale-stress for the round-13 un-stressed >2x ops.

Round-13 verdict task 1: eight operators carried a >2x sf0.1 ratio with
the "per-query scheduling floor, amortizes at scale" claim ASSERTED but
not measured (`bm25_topk`, `graph_khop_reach`, `graph_link_prediction_ra`,
`ts_linreg_trend`, `hilbert_layout_index`, `mmr_diversified_topk`,
`retrieval_eval_metrics`, `ts_ewma`); task 2 adds the restructured
`market_basket_lift` (the one op above DuckDB parity at every measured
scale in r13 — 1.13x at x10 before the single-shuffle rewrite).

Method (the r13 weak-stress playbook, generalized): the full-table
input-linear x10 replica dir from bench._build_stress_dir — every keyed
table unions 10 copies under disjoint key offsets, document text salted
per replica — so both engines read the SAME parquet at both scales and
run the exact declared query / registry oracle. Per (query, scale):
warm + median-of-3 through the pandas channel on both sides, row-count
equality asserted. Writes BENCH_scale_r14.json.

Usage: python tools/bench_scale_r14.py [name,name,...] [--x100]

--x100 adds a third decade (the full-table x100 replica dir — ~60M-row
lineitem, ~2M docs/vectors) for the ops whose x10 row is still above
parity: the scheduling-floor claim predicts the flat Spark absolute
crosses below DuckDB's linear growth there. Results merge into
BENCH_scale_r14.json (an existing file's runs are updated, not
clobbered).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = [
    "bm25_topk",
    "graph_khop_reach",
    "graph_link_prediction_ra",
    "ts_linreg_trend",
    "hilbert_layout_index",
    "mmr_diversified_topk",
    "retrieval_eval_metrics",
    "ts_ewma",
    "market_basket_lift",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = set(args[0].split(",")) if args else None
    x100 = "--x100" in sys.argv

    import bench
    from bench import SF_DIR, _build_stress_dir, _duck_connect, _duck_median

    from nibbledb_spark import get_spark
    from nibbledb_spark.queries import ORACLE, QUERIES

    spark = get_spark("scale_r14", shuffle_partitions=64)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    root = os.path.join("/tmp", "nibble_stress_sweep")
    mults = (1, 10, 100) if x100 else (1, 10)
    dirs = {1: SF_DIR}
    for m in mults[1:]:
        dirs[m] = _build_stress_dir(spark, m, root)

    out: dict = {
        "metric": "scale_stress_r14",
        "unit": "sec",
        "copies": mults[-1],
        "sf": bench.sf_of(SF_DIR),
        "runs": {},
    }
    if os.path.exists("BENCH_scale_r14.json"):
        with open("BENCH_scale_r14.json") as f:
            out["runs"] = json.load(f).get("runs", {})
    if only is None:
        names = list(OPS)
    else:
        unknown = sorted(only - set(QUERIES))
        if unknown:
            raise SystemExit(f"not in the query registry: {unknown}")
        # any declared query can ride the same paired protocol
        names = [n for n in list(QUERIES) if n in only]

    def oracle_for(name: str) -> str:
        sql = ORACLE[name]
        if name == "market_basket_lift":
            # at x10 DuckDB inlines the unmaterialized `b` CTE into all
            # three consumers and the repeated DISTINCT goes
            # single-threaded for >30 min (r13 lesson) — materialize it
            sql = sql.replace("WITH b AS (", "WITH b AS MATERIALIZED (")
        return sql

    # All Spark timing first, then all DuckDB timing, so neither
    # engine's runs interleave with the other's memory pressure
    # (the stress-sweep protocol).
    spark_t: dict[str, dict[int, float]] = {}
    rows_at: dict[str, dict[int, int]] = {}
    for name in names:
        fn = QUERIES[name]
        spark_t[name], rows_at[name] = {}, {}
        for mult in mults:
            spark.catalog.clearCache()
            fn(spark, dirs[mult]).toPandas()  # warm (JIT, footers)
            samples = []
            for _ in range(3 if mult < 100 else 2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = len(fn(spark, dirs[mult]).toPandas())
                samples.append(time.perf_counter() - t0)
            spark_t[name][mult] = statistics.median(samples)
            rows_at[name][mult] = n
            r = out["runs"].setdefault(name, {})
            r[f"spark_x{mult}_s"] = round(spark_t[name][mult], 3)
            r[f"rows_x{mult}"] = n
            with open("BENCH_scale_r14.json", "w") as f:
                f.write(json.dumps(out) + "\n")
            print(
                f"spark {name} x{mult}: {spark_t[name][mult]:.3f}s "
                f"({n:,} rows)",
                flush=True,
            )

    def flush_json() -> None:
        with open("BENCH_scale_r14.json", "w") as f:
            f.write(json.dumps(out) + "\n")

    for name in names:
        for mult in mults:
            r = out["runs"].setdefault(name, {})
            r[f"spark_x{mult}_s"] = round(spark_t[name][mult], 3)
            r[f"rows_x{mult}"] = rows_at[name][mult]
    flush_json()

    for mult in mults:
        for name in names:
            # fresh connection per (op, scale): one op's memory bloat or
            # OOM must not take down the rest of the pass (an
            # accumulated shared connection OOM'd mid-x10 on the first
            # deep sitting)
            con = _duck_connect(dirs[mult])
            sql = oracle_for(name)
            try:
                n_duck = len(con.execute(sql).df())
            except Exception as e:  # noqa: BLE001 — record, continue
                print(
                    f"duck  {name} x{mult}: count failed "
                    f"({type(e).__name__}: {str(e)[:100]})",
                    flush=True,
                )
                con.close()
                continue
            assert n_duck == rows_at[name][mult], (
                name,
                mult,
                n_duck,
                rows_at[name][mult],
            )
            d = _duck_median(con, sql, runs=3 if mult < 100 else 2)
            con.close()
            r = out["runs"][name]
            if d is not None:
                r[f"duck_x{mult}_s"] = round(d, 3)
                r[f"ratio_x{mult}"] = round(spark_t[name][mult] / d, 2)
            flush_json()
            print(
                f"duck  {name} x{mult}: "
                f"{'-' if d is None else f'{d:.3f}s'} "
                f"(ratio {r.get(f'ratio_x{mult}', '-')})",
                flush=True,
            )

    flush_json()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
