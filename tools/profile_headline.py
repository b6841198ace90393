"""Per-query cost decomposition for the headline set (guide §1).

For each query: t_build (Python DataFrame construction + analysis),
t_noop (execution into the noop sink — computes every column, no
collection), t_pandas (the bench's real action: toPandas through
Arrow), and the number of Spark jobs the toPandas action spawns
(scheduling floor: each job is a driver round-trip; global sorts add a
range-sampling job, AQE adds stage-materialization jobs).

Usage: python tools/profile_headline.py [name ...]   (default: bench HEADLINE)
Output: one markdown table to stdout; diagnostics to stderr.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from bench import HEADLINE
    from nibbledb_spark.queries import QUERIES
    from nibbledb_spark.session import get_spark

    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(HEADLINE)
    spark = get_spark("profile_headline")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # warm pass (JIT + footers), mirrors bench.py
    for n in names:
        QUERIES[n](spark, SF_DIR).toPandas()

    rows = []
    for n in names:
        fn = QUERIES[n]

        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.schema  # force analysis
        t_build = time.perf_counter() - t0

        sc.setJobDescription(f"profile:{n}:noop")
        df.write.format("noop").mode("overwrite").save()  # warm the exact plan
        noop_samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noop_samples.append(time.perf_counter() - t0)
        t_noop = statistics.median(noop_samples)

        sc.setJobDescription(f"profile:{n}:toPandas")
        fn(spark, SF_DIR).toPandas()  # warm
        pandas_samples = []
        jobs = 0
        for i in range(3):
            j0 = sc._jsc.sc().dagScheduler().nextJobId()  # py4j unboxes to the current int value
            t0 = time.perf_counter()
            fn(spark, SF_DIR).toPandas()
            pandas_samples.append(time.perf_counter() - t0)
            j1 = sc._jsc.sc().dagScheduler().nextJobId()  # py4j unboxes to the current int value
            jobs = int(j1) - int(j0)
        t_pandas = statistics.median(pandas_samples)
        sc.setJobDescription(None)

        rows.append((n, t_build, t_noop, t_pandas, jobs))
        print(
            f"{n}: build {t_build:.3f}s noop {t_noop:.3f}s "
            f"toPandas {t_pandas:.3f}s jobs {jobs}",
            file=sys.stderr,
            flush=True,
        )

    print("| query | build_s | noop_s | toPandas_s | jobs |")
    print("|---|---|---|---|---|")
    for n, b, no, p, j in rows:
        print(f"| {n} | {b:.3f} | {no:.3f} | {p:.3f} | {j} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
