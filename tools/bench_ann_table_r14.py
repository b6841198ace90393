"""ANN decision table (round-13 verdict stretch item 9): SRP vs IVF vs
IVF+PQ (± exact rerank) vs brute force on the x1 / x10 / x100 embedding
corpora — recall@10 against the brute-force ground truth, median query
latency, index build time, and on-disk index size. The output is the
"which index when" table for BASELINE.md.

Method: 16 query vectors, k=10. Recall@10 = |approx ∩ exact| / 10
averaged over queries. Each persisted index builds once per scale
(build timed separately — it amortizes over every query the index ever
serves); query latency is warm + median-of-3 through toPandas. The
x10/x100 replica dirs are bench._build_stress_dir's (disjoint vec_id
offsets — each replica is its own island, so recall stays comparable
across scales). Writes BENCH_ann_table_r14.json.

Usage: python tools/bench_ann_table_r14.py [--x100]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
NQ = 16


def dir_bytes(p: str) -> int:
    total = 0
    for root, _, files in os.walk(p):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from bench import SF_DIR, _build_stress_dir
    from nibbledb_spark import get_spark
    from nibbledb_spark.operators.similarity import (
        build_ivf_index,
        build_ivfpq_index,
        cosine_topk,
        ivf_topk_indexed,
        ivfpq_topk_indexed,
        srp_topk,
    )

    x100 = "--x100" in sys.argv
    spark = get_spark("ann_table_r14", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    root = os.path.join("/tmp", "nibble_stress_sweep")
    dirs = {1: SF_DIR, 10: _build_stress_dir(spark, 10, root)}
    if x100:
        dirs[100] = _build_stress_dir(spark, 100, root)

    out: dict = {
        "metric": "ann_decision_table",
        "unit": "sec",
        "k": K,
        "n_queries": NQ,
        "scales": {},
    }
    work = tempfile.mkdtemp(prefix="ann_table_")
    try:
        for mult in sorted(dirs):
            # deterministic per-id direction perturbation: the replica
            # dirs clone vectors verbatim under offset ids, so without
            # this every query's top-k is its own exact clones and
            # recall degenerates to 1.0 for any method at x10/x100
            emb = (
                spark.read.parquet(
                    os.path.join(dirs[mult], "embeddings.parquet")
                )
                .select(
                    "vec_id",
                    "label",
                    F.expr(
                        "transform(embedding, (x, i) -> x + "
                        "CAST((vec_id * 31 + i) % 17 - 8 AS DOUBLE) / 500.0)"
                    ).alias("embedding"),
                )
                .persist()
            )
            n_vec = emb.count()
            queries = emb.where(F.col("vec_id") < NQ).persist()
            queries.count()
            # centroid count scales ~sqrt(corpus): the standard IVF rule
            n_cent = max(8, int(n_vec ** 0.5) // 8)
            nprobe = max(2, n_cent // 8)
            scale_rec: dict = {"n_vectors": n_vec, "n_centroids": n_cent,
                               "nprobe": nprobe, "methods": {}}

            exact = {
                (r["query_id"], r["neighbor_id"])
                for r in cosine_topk(emb, queries, K).collect()
            }

            def timed_query(build_df):
                build_df().toPandas()  # warm
                samples = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    df = build_df().toPandas()
                    samples.append(time.perf_counter() - t0)
                got = {
                    (q, n)
                    for q, n in zip(df["query_id"], df["neighbor_id"])
                }
                return statistics.median(samples), len(got & exact) / len(exact)

            # --- brute force (the recall=1 baseline) -------------------
            qs, rec = timed_query(lambda: cosine_topk(emb, queries, K))
            scale_rec["methods"]["brute"] = {
                "query_s": round(qs, 3), "recall_at_10": round(rec, 3),
                "build_s": 0.0, "index_bytes": 0,
            }

            # --- SRP (no persisted index: signatures on the fly) -------
            qs, rec = timed_query(
                lambda: srp_topk(emb, queries, K, dim=64, n_planes=6, n_tables=4)
            )
            scale_rec["methods"]["srp"] = {
                "query_s": round(qs, 3), "recall_at_10": round(rec, 3),
                "build_s": 0.0, "index_bytes": 0,
            }

            # --- persisted IVF -----------------------------------------
            p_ivf = f"{work}/ivf_x{mult}"
            t0 = time.perf_counter()
            build_ivf_index(emb, p_ivf, n_centroids=n_cent, kmeans_iters=3)
            b_ivf = time.perf_counter() - t0
            qs, rec = timed_query(
                lambda: ivf_topk_indexed(spark, p_ivf, queries, K, nprobe=nprobe)
            )
            scale_rec["methods"]["ivf"] = {
                "query_s": round(qs, 3), "recall_at_10": round(rec, 3),
                "build_s": round(b_ivf, 2),
                "index_bytes": dir_bytes(p_ivf + "/postings"),
            }

            # --- persisted IVF+PQ, ADC only + exact rerank -------------
            p_pq = f"{work}/ivfpq_x{mult}"
            t0 = time.perf_counter()
            build_ivfpq_index(emb, p_pq, n_centroids=n_cent, kmeans_iters=3)
            b_pq = time.perf_counter() - t0
            qs, rec = timed_query(
                lambda: ivfpq_topk_indexed(spark, p_pq, queries, K, nprobe=nprobe)
            )
            scale_rec["methods"]["ivfpq_adc"] = {
                "query_s": round(qs, 3), "recall_at_10": round(rec, 3),
                "build_s": round(b_pq, 2),
                "index_bytes": dir_bytes(p_pq + "/postings"),
            }
            qs, rec = timed_query(
                lambda: ivfpq_topk_indexed(
                    spark, p_pq, queries, K, nprobe=nprobe,
                    rerank_with=emb, n_candidates=50,
                )
            )
            scale_rec["methods"]["ivfpq_rerank50"] = {
                "query_s": round(qs, 3), "recall_at_10": round(rec, 3),
                "build_s": round(b_pq, 2),
                "index_bytes": dir_bytes(p_pq + "/postings"),
            }

            out["scales"][f"x{mult}"] = scale_rec
            print(f"x{mult}", json.dumps(scale_rec), flush=True)
            emb.unpersist()
            queries.unpersist()
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    with open("BENCH_ann_table_r14.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
