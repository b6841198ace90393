"""ANN decision table on a NATURAL distribution (round-14 verdict task
4): the r14 table ran on disjoint-copy replica corpora, whose
clone-family structure flatters x10/x100 recall (every query's true
top-k contains exact clones any bucketing method trivially finds), and
its "SRP never pays" verdict conflated query-time signature computation
with the production persisted-signature path.

This table fixes both:

- Corpus: a deterministic Gaussian mixture generated in-plan (no RNG
  state — splitmix-style integer hashes of (cluster, dim) for the 32
  true centers and (id, dim) for the per-vector noise; sum of 4
  uniforms approximates the normal well enough for a benchmark
  distribution). Sizes mirror the r14 scales: 2k / 20k / 200k vectors,
  dim 64. Queries are 16 held-IN corpus vectors (self excluded), so
  ground truth is non-degenerate at every scale.
- Methods: brute (recall-1 baseline), query-time SRP, PERSISTED SRP
  (build_srp_index / srp_topk_indexed — signatures computed once,
  probes read only the query buckets), persisted IVF, persisted IVF+PQ
  (ADC, and +exact-rerank-50).

Writes BENCH_ann_table_r15.json. Usage:
  python tools/bench_ann_table_r15.py [--x100]
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
DIM = 64
N_CLUSTERS = 32
SIZES = {1: 2_000, 10: 20_000, 100: 200_000}


def dir_bytes(p: str) -> int:
    total = 0
    for root, _, files in os.walk(p):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def gaussian_mixture(spark, n: int):
    """(vec_id, embedding) rows: center[id % 32] + noise, all derived
    from splitmix hashes — deterministic across runs and partitionings."""
    from pyspark.sql import functions as F

    def u01(seed_expr: str, salt: int) -> str:
        # integer hash mix on a bigint expression -> uniform [0, 1).
        # Every product is bounded under 2^63 (ANSI mode throws on
        # long overflow): the seed folds to 31 bits before each
        # multiply by a 32-bit constant.
        s0 = f"pmod(CAST({seed_expr} AS BIGINT), 2147483647)"
        z = f"({s0} * 2654435769 + {salt})"
        z2 = f"pmod(({z}) ^ (({z}) DIV 1073741824), 2147483647)"
        m1 = f"(({z2} * 1103515245 + 12345) & 2147483647)"
        return f"(CAST({m1} AS DOUBLE) / 2147483648.0)"

    # per-vector noise / per-cluster center, each a sum of 4 uniforms
    # minus 2 (CLT normal approximation on [-2, 2))
    noise = (
        "aggregate(sequence(0, 3), CAST(0.0 AS DOUBLE), (a, s) -> a + "
        + u01("vec_id * 64 + i + s * 16777619", 12345)
        + ") - 2.0"
    )
    cent = (
        "aggregate(sequence(0, 3), CAST(0.0 AS DOUBLE), (a, s) -> a + "
        + u01("(vec_id % 32) * 64 + i + s * 2246822519", 777)
        + ") - 2.0"
    )
    # center scale 2.0 -> intra-cluster cosine ~0.8, inter ~0 (a
    # natural embedding-like overlap; 4.0 gave an unrealistically
    # clean 0.93)
    vec = (
        f"transform(sequence(0, {DIM - 1}), "
        f"i -> 2.0 * ({cent}) + ({noise}))"
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from nibbledb_spark import get_spark
    from nibbledb_spark.operators.similarity import (
        build_ivf_index,
        build_ivfpq_index,
        build_srp_index,
        cosine_topk,
        ivf_topk_indexed,
        ivfpq_topk_indexed,
        srp_topk,
        srp_topk_indexed,
    )

    x100 = "--x100" in sys.argv
    spark = get_spark("ann_table_r15", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    mults = (1, 10, 100) if x100 else (1, 10)

    out: dict = {
        "metric": "ann_decision_table_r15",
        "unit": "sec",
        "k": K,
        "n_queries": NQ,
        "dim": DIM,
        "distribution": f"gaussian mixture, {N_CLUSTERS} clusters",
        "scales": {},
    }
    work = tempfile.mkdtemp(prefix="ann_table_r15_")
    try:
        for mult in mults:
            n = SIZES[mult]
            emb = gaussian_mixture(spark, n).persist()
            n_vec = emb.count()
            queries = emb.where(F.col("vec_id") < NQ).persist()
            queries.count()
            n_cent = max(8, int(n_vec ** 0.5) // 8)
            nprobe = max(2, n_cent // 8)
            scale_rec: dict = {
                "n_vectors": n_vec,
                "n_centroids": n_cent,
                "nprobe": nprobe,
                "methods": {},
            }

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
                    (q, nb)
                    for q, nb in zip(df["query_id"], df["neighbor_id"])
                }
                return (
                    statistics.median(samples),
                    len(got & exact) / len(exact),
                )

            def rec_method(name, qs, rec, build_s=0.0, idx_bytes=0):
                scale_rec["methods"][name] = {
                    "query_s": round(qs, 3),
                    "recall_at_10": round(rec, 3),
                    "build_s": round(build_s, 2),
                    "index_bytes": idx_bytes,
                }
                print(f"x{mult} {name}: q={qs:.3f}s r={rec:.3f}", flush=True)

            qs, rec = timed_query(lambda: cosine_topk(emb, queries, K))
            rec_method("brute", qs, rec)

            qs, rec = timed_query(
                lambda: srp_topk(
                    emb, queries, K, dim=DIM, n_planes=6, n_tables=4
                )
            )
            rec_method("srp_querytime", qs, rec)

            p_srp = f"{work}/srp_x{mult}"
            t0 = time.perf_counter()
            build_srp_index(emb, p_srp, dim=DIM, n_planes=6, n_tables=4)
            b_srp = time.perf_counter() - t0
            qs, rec = timed_query(
                lambda: srp_topk_indexed(spark, p_srp, queries, K)
            )
            rec_method(
                "srp_indexed", qs, rec, b_srp, dir_bytes(p_srp + "/postings")
            )

            p_ivf = f"{work}/ivf_x{mult}"
            t0 = time.perf_counter()
            build_ivf_index(emb, p_ivf, n_centroids=n_cent, kmeans_iters=3)
            b_ivf = time.perf_counter() - t0
            qs, rec = timed_query(
                lambda: ivf_topk_indexed(
                    spark, p_ivf, queries, K, nprobe=nprobe
                )
            )
            rec_method(
                "ivf", qs, rec, b_ivf, dir_bytes(p_ivf + "/postings")
            )

            p_pq = f"{work}/ivfpq_x{mult}"
            t0 = time.perf_counter()
            build_ivfpq_index(emb, p_pq, n_centroids=n_cent, kmeans_iters=3)
            b_pq = time.perf_counter() - t0
            qs, rec = timed_query(
                lambda: ivfpq_topk_indexed(
                    spark, p_pq, queries, K, nprobe=nprobe
                )
            )
            rec_method(
                "ivfpq_adc", qs, rec, b_pq, dir_bytes(p_pq + "/postings")
            )
            qs, rec = timed_query(
                lambda: ivfpq_topk_indexed(
                    spark, p_pq, queries, K, nprobe=nprobe,
                    rerank_with=emb, n_candidates=50,
                )
            )
            rec_method(
                "ivfpq_rerank50", qs, rec, b_pq,
                dir_bytes(p_pq + "/postings"),
            )

            out["scales"][f"x{mult}"] = scale_rec
            with open("BENCH_ann_table_r15.json", "w") as f:
                f.write(json.dumps(out) + "\n")
            emb.unpersist()
            queries.unpersist()
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
