"""Paired x1/x10[/x100] scale-stress for the round-14 open perf rows.

Round-14 verdict tasks 1-2: the two remaining >2x rows were re-planned
this round — `dedup_substring_self_spans` (anchor-hash self-join ->
single-exchange per-doc window pass) and `graph_triangle_count` (wedge
self-join -> row-local posexplode x slice pair emit over collected
apex out-lists). This harness re-measures both on the identical
disjoint-copy replica protocol as BENCH_scale_r14.json so the rows are
directly comparable round-over-round.

Usage: python tools/bench_scale_r15.py [name,name,...] [--x100]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = [
    "dedup_substring_self_spans",
    "graph_triangle_count",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = set(args[0].split(",")) if args else None
    x100 = "--x100" in sys.argv

    import bench
    from bench import SF_DIR, _build_stress_dir, _duck_connect, _duck_median

    from nibbledb_spark import get_spark
    from nibbledb_spark.queries import ORACLE, QUERIES

    spark = get_spark("scale_r15", shuffle_partitions=64)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    root = os.path.join("/tmp", "nibble_stress_sweep")
    mults = (1, 10, 100) if x100 else (1, 10)
    dirs = {1: SF_DIR}
    for m in mults[1:]:
        dirs[m] = _build_stress_dir(spark, m, root)

    out: dict = {
        "metric": "scale_stress_r15",
        "unit": "sec",
        "copies": mults[-1],
        "sf": bench.sf_of(SF_DIR),
        "runs": {},
    }
    if os.path.exists("BENCH_scale_r15.json"):
        with open("BENCH_scale_r15.json") as f:
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
    # x100 wedge-heavy ops write ~50-100 GB of shuffle files per run;
    # Spark only deletes them when the ShuffleDependency is GC'd on
    # the driver, so without an explicit GC the warm + 2 samples
    # ACCUMULATE three runs' files and ENOSPC the 77 GB tmp volume
    # (measured: the first triangle x100 sitting died exactly there).
    import gc

    def scrub() -> None:
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        time.sleep(3)  # ContextCleaner deletes asynchronously

    spark_t: dict[str, dict[int, float]] = {}
    rows_at: dict[str, dict[int, int]] = {}
    for name in names:
        fn = QUERIES[name]
        spark_t[name], rows_at[name] = {}, {}
        for mult in mults:
            scrub()
            fn(spark, dirs[mult]).toPandas()  # warm (JIT, footers)
            samples = []
            for _ in range(3 if mult < 100 else 2):
                scrub()
                t0 = time.perf_counter()
                n = len(fn(spark, dirs[mult]).toPandas())
                samples.append(time.perf_counter() - t0)
            spark_t[name][mult] = statistics.median(samples)
            rows_at[name][mult] = n
            r = out["runs"].setdefault(name, {})
            r[f"spark_x{mult}_s"] = round(spark_t[name][mult], 3)
            r[f"rows_x{mult}"] = n
            with open("BENCH_scale_r15.json", "w") as f:
                f.write(json.dumps(out) + "\n")
            print(
                f"spark {name} x{mult}: {spark_t[name][mult]:.3f}s "
                f"({n:,} rows)",
                flush=True,
            )

    def flush_json() -> None:
        with open("BENCH_scale_r15.json", "w") as f:
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
