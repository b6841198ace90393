"""Per-phase job/time decomposition of the two crawl-gate replays and
the SRP indexed probe (r16 opt targets; guide §1 measure-first).

Replicates each replay's driver loop with a timer + job counter around
every phase (the sinks themselves are opaque single calls), so the
numbers attribute the replay's wall clock to: index build, per-batch
materialization, per-batch index add, per-batch on_pass commit, final
read. Job counts come from the DAGScheduler's job-id high-water mark —
each job is a driver scheduling round-trip, the quantity the micro-batch
floor is made of.

Usage: python tools/profile_gates_r16.py [semdedup] [lsh] [srp]
Diagnostics to stderr; a markdown table per gate to stdout.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Phase:
    def __init__(self, spark):
        self.sc = spark.sparkContext
        self.rows = []

    def run(self, label, fn):
        j0 = int(self.sc._jsc.sc().dagScheduler().nextJobId())
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        j1 = int(self.sc._jsc.sc().dagScheduler().nextJobId())
        self.rows.append((label, dt, j1 - j0))
        print(f"  {label}: {dt:.3f}s  {j1 - j0} jobs", file=sys.stderr, flush=True)
        return out

    def table(self, title):
        print(f"\n### {title}\n")
        print("| phase | sec | jobs |")
        print("|---|---|---|")
        for label, dt, jobs in self.rows:
            print(f"| {label} | {dt:.3f} | {jobs} |")
        total = sum(r[1] for r in self.rows)
        jtotal = sum(r[2] for r in self.rows)
        print(f"| TOTAL | {total:.3f} | {jtotal} |")


def profile_semdedup(spark) -> None:
    from pyspark.sql import functions as F

    from nibbledb_spark.operators.similarity import build_ivf_index, semdedup_gate
    from nibbledb_spark.sources.registry import load_table

    e = load_table(spark, "embeddings", SF_DIR)
    base = tempfile.mkdtemp(prefix="prof_sdgate_")
    idx = os.path.join(base, "index")
    passed = os.path.join(base, "passed")
    ph = Phase(spark)
    try:
        seed = e.where("vec_id % 4 = 0")
        cents = (
            seed.orderBy(F.col("vec_id").asc())
            .limit(8)
            .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
        )
        ph.run("build_ivf_index", lambda: build_ivf_index(seed, idx, centroids=cents))

        def on_pass(surv, batch_id):
            surv.select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                F.col("vec_id").cast("long").alias("vec_id"),
            ).coalesce(1).write.mode("append").parquet(passed)

        sink = semdedup_gate(spark, idx, eps=0.35, on_pass=on_pass)
        for t_ in (1, 2, 3):
            ph.run(f"batch_{t_}", lambda t=t_: sink(e.where(f"vec_id % 4 = {t}"), t))
        ph.run(
            "final_read",
            lambda: spark.read.parquet(passed).orderBy("batch_id", "vec_id").toPandas(),
        )
        ph.table("semdedup_gate_replay")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def profile_semdedup_phases(spark) -> None:
    """Finer: one batch of the semdedup sink unrolled into its internal
    actions (materialize / add / on_pass) so the per-batch floor is
    attributed inside the sink."""
    from pyspark.sql import functions as F

    from nibbledb_spark.operators.similarity import (
        _dot,
        _ivf_postings_with_norms,
        build_ivf_index,
        ivf_assign,
        ivf_index_add,
        l2_norm,
    )
    from nibbledb_spark.sources.registry import load_table

    e = load_table(spark, "embeddings", SF_DIR)
    base = tempfile.mkdtemp(prefix="prof_sdphase_")
    idx = os.path.join(base, "index")
    passed = os.path.join(base, "passed")
    ph = Phase(spark)
    try:
        seed = e.where("vec_id % 4 = 0")
        cents_df = (
            seed.orderBy(F.col("vec_id").asc())
            .limit(8)
            .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
        )
        build_ivf_index(seed, idx, centroids=cents_df)
        cents = spark.read.parquet(f"{idx}/centroids")
        batch = e.where("vec_id % 4 = 1").persist()
        eps, id_col, vec_col = 0.35, "vec_id", "embedding"

        asg = ivf_assign(batch, cents, id_col=id_col, vec_col=vec_col)
        m = asg.join(
            batch.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
                l2_norm(vec_col).alias("vn"),
            ),
            "id",
        ).persist()
        post = _ivf_postings_with_norms(spark, idx).select("cid", "id", "v", "vn")
        ref = post.select(
            "cid", F.col("id").alias("rid"), F.col("v").alias("rv"),
            F.col("vn").alias("rvn"), F.lit(True).alias("indexed"),
        ).unionByName(
            m.select(
                "cid", F.col("id").alias("rid"), F.col("v").alias("rv"),
                F.col("vn").alias("rvn"), F.lit(False).alias("indexed"),
            )
        )
        drops = (
            m.join(ref, "cid")
            .where(
                (F.col("indexed") & (F.col("rid") != F.col("id")))
                | (~F.col("indexed") & (F.col("rid") < F.col("id")))
            )
            .where((_dot("v", "rv") / (F.col("vn") * F.col("rvn"))) > eps)
            .select(F.col("id").alias(id_col))
        )
        survivors = batch.join(drops, id_col, "left_anti").persist()
        ph.run("survivors.count (materialize)", survivors.count)
        already = post.select(F.col("id").alias(id_col))
        ph.run(
            "ivf_index_add",
            lambda: ivf_index_add(
                spark, idx,
                survivors.join(already, id_col, "left_anti"),
                id_col=id_col, vec_col=vec_col,
                assignments=m.select("id", "cid"),
            ),
        )
        ph.run(
            "on_pass write",
            lambda: survivors.select(
                F.lit(1).cast("long").alias("batch_id"),
                F.col("vec_id").cast("long").alias("vec_id"),
            ).coalesce(1).write.mode("append").parquet(passed),
        )
        ph.table("semdedup sink batch 1, unrolled")
        batch.unpersist()
        m.unpersist()
        survivors.unpersist()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def profile_lsh(spark) -> None:
    from pyspark.sql import functions as F

    from nibbledb_spark.operators.dedup import build_lsh_index, lsh_dedup_gate
    from nibbledb_spark.sources.registry import load_table

    docs = load_table(spark, "documents", SF_DIR)
    base = tempfile.mkdtemp(prefix="prof_lshgate_")
    idx = os.path.join(base, "index")
    passed = os.path.join(base, "passed")
    ph = Phase(spark)
    try:
        ph.run(
            "build_lsh_index",
            lambda: build_lsh_index(docs.where("doc_id % 4 = 0"), idx),
        )

        def on_pass(surv, batch_id):
            surv.select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                F.col("doc_id").cast("long").alias("doc_id"),
            ).write.mode("append").parquet(passed)

        sink = lsh_dedup_gate(spark, idx, threshold=0.8, on_pass=on_pass)
        for t_ in (1, 2, 3):
            ph.run(f"batch_{t_}", lambda t=t_: sink(docs.where(f"doc_id % 4 = {t}"), t))
        ph.run(
            "final_read",
            lambda: spark.read.parquet(passed).orderBy("batch_id", "doc_id").toPandas(),
        )
        ph.table("lsh_gate_replay")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def profile_srp(spark) -> None:
    from pyspark.sql import functions as F

    from nibbledb_spark.operators.similarity import build_srp_index, srp_topk_indexed
    from nibbledb_spark.sources.registry import load_table

    e = load_table(spark, "embeddings", SF_DIR)
    base = tempfile.mkdtemp(prefix="prof_srp_")
    idx = os.path.join(base, "index")
    ph = Phase(spark)
    try:
        ph.run(
            "build_srp_index",
            lambda: build_srp_index(e, idx, dim=64, n_planes=6, n_tables=2),
        )
        q = e.where(F.col("vec_id") < 5)
        ph.run(
            "probe cold",
            lambda: srp_topk_indexed(spark, idx, q, 3).toPandas(),
        )
        for i in range(3):
            ph.run(
                f"probe warm {i}",
                lambda: srp_topk_indexed(spark, idx, q, 3).toPandas(),
            )
        ph.table("srp_ann_topk_indexed build/probe split")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    from nibbledb_spark.session import get_spark

    which = set(a for a in sys.argv[1:] if not a.startswith("-")) or {
        "semdedup", "semdedup-phases", "lsh", "srp"
    }
    spark = get_spark("profile_gates_r16")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    reps = int(os.environ.get("PROF_REPS", "2"))
    for r in range(reps):
        print(f"--- rep {r} ---", file=sys.stderr, flush=True)
        if "semdedup" in which:
            profile_semdedup(spark)
        if "semdedup-phases" in which:
            profile_semdedup_phases(spark)
        if "lsh" in which:
            profile_lsh(spark)
        if "srp" in which:
            profile_srp(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
