"""Paired Spark-vs-DuckDB timing for the round-12 operator additions at
sf0.1 (the winnow-stress / deep-extras measurement pattern): warm both
engines once, then time the action. Writes BENCH_new_ops_r13.json.

Usage: python tools/bench_new_ops_r13.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAMES = [
    "ts_linreg_trend",
    "graph_triangle_count",
    "graph_khop_reach",
    "graph_label_propagation",
    "graph_link_prediction",
    "graph_link_prediction_ra",
    "graph_kcore",
    "hilbert_layout_index",
    "market_basket_lift",
    "edit_distance_near_dups",
    "bm25_topk",
]
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    import duckdb

    from nibbledb_spark import get_spark
    from nibbledb_spark.queries import ORACLE, QUERIES

    spark = get_spark("bench_new_ops", shuffle_partitions=32)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    out: dict = {"metric": "new_ops_r13", "unit": "sec", "queries": {}, "sf": 0.1}
    for name in NAMES:
        fn, sql = QUERIES[name], ORACLE[name]
        # isolate queries: the graph operators pin persisted frames by
        # contract; without a clear, later queries measure a
        # cache-pressured JVM instead of themselves
        spark.catalog.clearCache()
        fn(spark, SF_DIR).count()  # warm: JIT, parquet footers, broadcasts
        t0 = time.perf_counter()
        n_spark = fn(spark, SF_DIR).count()
        spark_s = time.perf_counter() - t0
        con.execute(sql).fetchall()  # warm
        t0 = time.perf_counter()
        n_duck = len(con.execute(sql).fetchall())
        duck_s = time.perf_counter() - t0
        assert n_spark == n_duck, (name, n_spark, n_duck)
        out["queries"][name] = {
            "spark_s": round(spark_s, 4),
            "duck_s": round(duck_s, 4),
            "ratio": round(spark_s / duck_s, 2) if duck_s > 0 else None,
            "rows": n_spark,
        }
        print(name, out["queries"][name], flush=True)

    total_s = sum(q["spark_s"] for q in out["queries"].values())
    total_d = sum(q["duck_s"] for q in out["queries"].values())
    out["spark_total"] = round(total_s, 4)
    out["duck_total"] = round(total_d, 4)
    out["ratio_vs_duckdb"] = round(total_s / total_d, 4)
    with open("BENCH_new_ops_r13.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
