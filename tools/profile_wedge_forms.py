"""Micro-bench: alternative formulations of the wedge pair-count
(12.5M wedges from 15k customer adjacency arrays) at sf0.1.

Usage: python tools/profile_wedge_forms.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t(label, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:44s} {best:7.3f}s  rows={r}", flush=True)


def main() -> None:
    from pyspark.sql import functions as F

    from nibbledb_spark import get_spark
    from nibbledb_spark.queries import _t

    spark = get_spark("wedge_forms", shuffle_partitions=32)
    li = _t(spark, SF_DIR, "lineitem").select("l_suppkey", "l_orderkey")
    o = _t(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    adj = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("node"))
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ns"))
        .persist()
    )
    print("adj rows:", adj.count())

    pairs_expr = F.expr(
        "flatten(transform(ns, (x, i) -> "
        "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS u, y AS v))))"
    )

    def form_transform_slice():
        return (
            adj.select(F.explode(pairs_expr).alias("p"))
            .groupBy("p.u", "p.v")
            .agg(F.count(F.lit(1)).alias("cn"))
            .count()
        )

    def form_double_explode():
        e1 = adj.select("ns", F.explode("ns").alias("u"))
        e2 = e1.select("u", F.explode("ns").alias("v")).where(F.col("u") < F.col("v"))
        return e2.groupBy("u", "v").agg(F.count(F.lit(1)).alias("cn")).count()

    def form_explode_filtered():
        # slice off the prefix before the second explode: emits exactly
        # the 12.5M ordered pairs, no post-filter of 25M
        e1 = adj.select(
            F.posexplode("ns").alias("i", "u"),
            F.col("ns").alias("ns"),
        )
        e2 = e1.select(
            "u", F.explode(F.slice("ns", F.col("i") + 2, F.size("ns"))).alias("v")
        )
        return e2.groupBy("u", "v").agg(F.count(F.lit(1)).alias("cn")).count()

    def mk_mapinpandas(nparts):
        def form():
            import pandas as pd  # noqa: F401

            def count_pairs(batches):
                import numpy as np
                import pandas as pd

                chunks = []
                tri = {}
                for pdf in batches:
                    for ns in pdf["ns"]:
                        a = np.asarray(ns, dtype=np.int64)
                        d = len(a)
                        if d < 2:
                            continue
                        if d not in tri:
                            tri[d] = np.triu_indices(d, k=1)
                        iu, iv = tri[d]
                        chunks.append(a[iu] * 10_000_000 + a[iv])
                if not chunks:
                    yield pd.DataFrame({"u": [], "v": [], "c": []}).astype("int64")
                    return
                keys = np.concatenate(chunks)
                u, c = np.unique(keys, return_counts=True)
                yield pd.DataFrame(
                    {"u": u // 10_000_000, "v": u % 10_000_000, "c": c}
                )

            partial = adj.coalesce(nparts).mapInPandas(
                count_pairs, "u long, v long, c long"
            )
            return partial.groupBy("u", "v").agg(F.sum("c").alias("cn")).count()

        return form

    t("transform/slice explode + groupBy", form_transform_slice)
    t("double explode + filter + groupBy", form_double_explode)
    t("posexplode + slice explode + groupBy", form_explode_filtered)
    t("mapInPandas vectorized p=8", mk_mapinpandas(8))
    t("mapInPandas vectorized p=16", mk_mapinpandas(16))
    t("mapInPandas vectorized p=32", mk_mapinpandas(32))

    spark.stop()


if __name__ == "__main__":
    main()
