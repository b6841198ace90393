"""Degree-skew stress for triangle counting: degree-ordered edge
orientation (what operators/graph.py triangle_count does) vs naive
id-ordered orientation on a hub graph — the "curse of the last
reducer" (Suri & Vassilvitskii WWW'11) made measurable.

Graph: one hub (node 0) adjacent to all of 1..H, plus the ring
(i, i+1) over 1..H — so every ring edge closes a triangle with the
hub (H−1 triangles) and the hub's degree is H. Id-ordering makes the
hub the apex of ALL its wedges (H·(H−1)/2 of them — quadratic in the
hub degree, concentrated in ONE join key); degree-ordering points
every hub edge INTO the hub, so wedges only form at ring nodes
(out-degree ≤ 2 each — linear total).

Writes BENCH_graph_stress_r12.json with wedge counts and wall-clock
for both orientations at H in {2k, 10k}; per-node triangle counts are
asserted identical (orientation-invariance).

Usage: python tools/bench_graph_stress_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def id_oriented_triangles(c):
    """triangle_count with the NAIVE id orientation (u -> v for u < v):
    identical counts, quadratic hub wedges."""
    o = c  # canonical edges are already (u < v): id orientation is free
    w1 = o.select(F.col("u").alias("a"), F.col("v").alias("x"))
    w2 = o.select(F.col("u").alias("a"), F.col("v").alias("y"))
    wedges = w1.join(w2, "a").where(F.col("x") < F.col("y"))
    closure = c.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closure, ["x", "y"])
    per_node = (
        tri.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    nodes = (
        c.select(F.col("u").alias("node"))
        .unionByName(c.select(F.col("v").alias("node")))
        .distinct()
    )
    return wedges, nodes.join(per_node, "node", "left").select(
        "node", F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_tri")
    )


def main() -> None:
    from nibbledb_spark import get_spark
    from nibbledb_spark.operators.graph import triangle_count

    spark = get_spark("graph_stress", shuffle_partitions=32)
    out: dict = {"metric": "triangle_orientation_stress", "unit": "sec", "runs": {}}
    for hub_deg in (10_000, 30_000):
        ring = spark.range(1, hub_deg).selectExpr("id AS src", "id + 1 AS dst")
        hub = spark.range(1, hub_deg + 1).selectExpr("CAST(0 AS LONG) AS src", "id AS dst")
        edges = ring.unionByName(hub)
        c = (
            edges.select(
                F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
            )
            .distinct()
            .persist()
        )
        c.count()

        t0 = time.perf_counter()
        deg_counts = {
            r["node"]: r["n_tri"]
            for r in triangle_count(c, src="u", dst="v").collect()
        }
        deg_s = time.perf_counter() - t0

        _, tri_id = id_oriented_triangles(c)
        t0 = time.perf_counter()
        id_counts = {r["node"]: r["n_tri"] for r in tri_id.collect()}
        id_s = time.perf_counter() - t0
        # analytic: the hub is the apex of ALL its neighbor pairs under
        # id order (node 0 is minimal), plus 1 wedge per interior ring node
        n_wedges_id = hub_deg * (hub_deg - 1) // 2 + (hub_deg - 2)

        assert deg_counts == id_counts, "orientation changed the counts"
        assert deg_counts[0] == hub_deg - 1  # hub closes every ring edge
        out["runs"][f"hub_{hub_deg}"] = {
            "edges": 2 * hub_deg - 1,
            "triangles_total": sum(id_counts.values()) // 3,
            "wedges_id_oriented": n_wedges_id,
            "degree_oriented_s": round(deg_s, 3),
            "id_oriented_s": round(id_s, 3),
            "speedup": round(id_s / deg_s, 2),
        }
        print(f"hub_{hub_deg}", out["runs"][f"hub_{hub_deg}"], flush=True)
        c.unpersist()
    with open("BENCH_graph_stress_r12.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
