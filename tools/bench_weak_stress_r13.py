"""Scale-stress for the round-12 perf-weak trio: does the sf0.1 gap
amortize when the DATA grows 10x while Spark's per-job floor stays
constant? (Round-12 verdict tasks 2-4: each fix needs either <2x
paired or a x10 run showing the barrier/floor cost amortizing.)

Method: replicate the sf0.1 inputs 10x under disjoint key offsets
(disjoint subgraphs / baskets — the peel, wedge counts, and pair
counts are exactly 10 independent copies, so correctness is pinned by
construction: row counts must be 10x the base run for kcore, and the
basket/link top-k must keep base-run values). Both engines read the
SAME temp parquet. Writes BENCH_weak_stress_r13.json.

Usage: python tools/bench_weak_stress_r13.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
COPIES = 10
OFF = 10_000_000


def main() -> None:
    import duckdb

    from pyspark.sql import functions as F

    from nibbledb_spark import get_spark
    from nibbledb_spark.operators.graph import kcore, link_prediction_common_neighbors
    from nibbledb_spark.operators.mining import basket_pair_lift

    spark = get_spark("weak_stress", shuffle_partitions=64)
    tmp = tempfile.mkdtemp(prefix="weak_stress_")
    out: dict = {"metric": "weak_ops_x10_stress", "unit": "sec", "copies": COPIES, "runs": {}}

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    # 10 disjoint copies: order/customer/part keys shift per copy so the
    # co-purchase graph, trade graph, and baskets are 10 separate islands
    cp = spark.range(COPIES).select((F.col("id") * OFF).alias("off"))
    li10 = li.crossJoin(cp).select(
        (F.col("l_orderkey") + F.col("off")).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("off")).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("off")).alias("l_suppkey"),
    )
    o10 = orders.crossJoin(cp).select(
        (F.col("o_orderkey") + F.col("off")).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("off")).alias("o_custkey"),
    )
    li10.write.parquet(f"{tmp}/lineitem10", mode="overwrite")
    o10.write.parquet(f"{tmp}/orders10", mode="overwrite")

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{tmp}/lineitem10/*.parquet')")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp}/orders10/*.parquet')")

    L = spark.read.parquet(f"{tmp}/lineitem10")
    O = spark.read.parquet(f"{tmp}/orders10")

    def timed(label, spark_fn, duck_sql, expect=None):
        if ONLY is not None and label not in ONLY:
            return
        spark.catalog.clearCache()
        n0 = spark_fn()  # warm (JIT, footers) — also returns the count
        t0 = time.perf_counter()
        n = spark_fn()
        spark_s = time.perf_counter() - t0
        assert n == n0
        con.execute(duck_sql).fetchall()
        t0 = time.perf_counter()
        n_d = len(con.execute(duck_sql).fetchall())
        duck_s = time.perf_counter() - t0
        assert n == n_d, (label, n, n_d)
        if expect is not None:
            assert n == expect, (label, n, expect)
        out["runs"][label] = {
            "spark_s": round(spark_s, 3),
            "duck_s": round(duck_s, 3),
            "ratio": round(spark_s / duck_s, 2),
            "rows": n,
        }
        print(label, out["runs"][label], flush=True)

    # --- kcore x10: 12M-edge co-purchase peel, k=70, 4 rounds ---------
    def kcore_spark():
        items = L.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("its")
        )
        pairs = F.expr(
            "flatten(transform(its, (x, i) -> "
            "transform(slice(its, i + 2, size(its)), y -> struct(x AS u, y AS v))))"
        )
        edges = items.select(F.explode(pairs).alias("p")).select(
            F.col("p.u").alias("src"), F.col("p.v").alias("dst")
        )
        return kcore(edges, 70, rounds=4).count()

    from nibbledb_spark.queries import ORACLE

    kcore_sql = ORACLE["graph_kcore"].replace("ORDER BY node", "")
    timed("kcore_x10", kcore_spark, kcore_sql, expect=19674 * COPIES)

    # --- link prediction x10: 5.9M-edge trade graph, wedges at customers
    def link_spark():
        tp = L.join(O, L.l_orderkey == O.o_orderkey).select(
            (F.col("l_suppkey") * 10 + 1).alias("src"),
            (F.col("o_custkey") * 10 + 2).alias("dst"),
        )
        return link_prediction_common_neighbors(
            tp, k=20, wedge_filter=F.col("node") % 10 == 2
        ).count()

    link_sql = ORACLE["graph_link_prediction"]
    timed("link_prediction_x10", link_spark, link_sql, expect=20)

    # --- market basket x10: 1.5M baskets ------------------------------
    def basket_spark():
        return basket_pair_lift(
            L, basket_col="l_orderkey", item_col="l_partkey", min_count=2, k=20
        ).count()

    # the registry oracle leaves CTE `b` unmaterialized (fine at sf0.1);
    # at x10 DuckDB inlines it into all three consumers and the repeated
    # DISTINCT goes single-threaded for >30 min — materialize it (the
    # kcore-oracle lesson applied at stress scale)
    basket_sql = ORACLE["market_basket_lift"].replace(
        "WITH b AS (", "WITH b AS MATERIALIZED ("
    )
    timed("market_basket_x10", basket_spark, basket_sql, expect=20)

    with open("BENCH_weak_stress_r13.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
