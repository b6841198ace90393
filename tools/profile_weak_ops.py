"""Stage-level timing breakdown for the three perf-weak operators at
sf0.1 — materialize each sub-frame separately to localize the cost.

Usage: python tools/profile_weak_ops.py [link|kcore|basket] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
WHICH = sys.argv[1] if len(sys.argv) > 1 else "link"


def t(label, df):
    t0 = time.perf_counter()
    n = df.count()
    print(f"{label:40s} {time.perf_counter() - t0:7.3f}s  rows={n}", flush=True)
    return n


def main() -> None:
    from pyspark.sql import functions as F

    from nibbledb_spark import get_spark
    from nibbledb_spark.queries import QUERIES, _t

    spark = get_spark("profile_weak", shuffle_partitions=32)
    # warm the whole query once
    name = {
        "link": "graph_link_prediction",
        "kcore": "graph_kcore",
        "basket": "market_basket_lift",
    }[WHICH]
    QUERIES[name](spark, SF_DIR).count()
    spark.catalog.clearCache()

    if WHICH == "link":
        li = _t(spark, SF_DIR, "lineitem").select("l_suppkey", "l_orderkey")
        o = _t(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
        tp = li.join(o, li.l_orderkey == o.o_orderkey).select(
            (F.col("l_suppkey") * 10 + 1).alias("src"),
            (F.col("o_custkey") * 10 + 2).alias("dst"),
        )
        c = (
            tp.select(
                F.least(F.col("src"), F.col("dst")).alias("u"),
                F.greatest(F.col("src"), F.col("dst")).alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            .persist()
        )
        t("c = canonical edges (distinct)", c)
        sym = c.select(F.col("u").alias("node"), F.col("v").alias("peer")).unionByName(
            c.select(F.col("v").alias("node"), F.col("u").alias("peer"))
        )
        deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
        t("deg (from cached c)", deg)
        hubs = sym.where(F.col("node") % 10 == 2)
        adj = hubs.groupBy("node").agg(
            F.sort_array(F.collect_set("peer")).alias("ns")
        )
        t("adj = collect_set per customer", adj)
        pairs_expr = F.expr(
            "flatten(transform(ns, (x, i) -> "
            "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS u, y AS v))))"
        )
        exploded = adj.select(F.explode(pairs_expr).alias("p")).select(
            F.col("p.u").alias("u"), F.col("p.v").alias("v")
        )
        t("exploded wedge pairs (no agg)", exploded)
        cn = exploded.groupBy("u", "v").agg(F.count(F.lit(1)).alias("cn"))
        t("cn = groupBy(u,v) count", cn)
        anti = cn.join(c, ["u", "v"], "left_anti")
        t("anti join vs c", anti)
        top = anti.orderBy(F.col("cn").desc(), "u", "v").limit(20)
        t("top-20 TakeOrdered", top)
    elif WHICH == "kcore":
        from nibbledb_spark.operators.graph import kcore

        li = _t(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
        items = li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("its")
        )
        pairs = F.expr(
            "flatten(transform(its, (x, i) -> "
            "transform(slice(its, i + 2, size(its)), y -> struct(x AS u, y AS v))))"
        )
        edges = items.select(F.explode(pairs).alias("p")).select(
            F.col("p.u").alias("src"), F.col("p.v").alias("dst")
        )
        e0 = (
            edges.select(
                F.least(F.col("src"), F.col("dst")).alias("u"),
                F.greatest(F.col("src"), F.col("dst")).alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        t("e0 build (distinct co-purchase)", e0)
        t0 = time.perf_counter()
        e0c = e0.localCheckpoint(eager=True)
        print(f"{'e0 localCheckpoint':40s} {time.perf_counter() - t0:7.3f}s", flush=True)
        t0 = time.perf_counter()
        out = kcore(edges, 70, rounds=4)
        n = out.count()
        print(f"{'kcore 4 rounds total':40s} {time.perf_counter() - t0:7.3f}s  rows={n}", flush=True)
    else:
        li = _t(spark, SF_DIR, "lineitem")
        sets = (
            li.select(F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item"))
            .groupBy("basket")
            .agg(F.sort_array(F.collect_set("item")).alias("its"))
            .persist()
        )
        t("sets = basket agg", sets)
        ci = sets.select(F.explode("its").alias("item")).groupBy("item").agg(
            F.count(F.lit(1)).alias("c")
        )
        t("ci item counts (cached sets)", ci)
        pairs_expr = F.expr(
            "flatten(transform(its, (x, i) -> "
            "transform(slice(its, i + 2, size(its)), y -> struct(x AS a, y AS b))))"
        )
        pc = (
            sets.select(F.explode(pairs_expr).alias("p"))
            .select(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("n_ab"))
            .where(F.col("n_ab") >= 2)
        )
        t("pc pair counts >= 2", pc)
        t0 = time.perf_counter()
        n = QUERIES["market_basket_lift"](spark, SF_DIR).count()
        print(f"{'full query (warm)':40s} {time.perf_counter() - t0:7.3f}s  rows={n}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
