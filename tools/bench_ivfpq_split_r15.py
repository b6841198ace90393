"""Split the persisted IVF+PQ indexed path into build_s vs probe_s
(round-14 verdict task 9).

``ivfpq_rerank_indexed_bound``'s deep-table "ratio" rows are
meaningless by design — the oracle is a constant bound-check and the
Spark side builds the WHOLE persisted index inside the timed region.
This reports the two halves separately as absolutes: build_s is the
one-off index materialization (mkdtemp k-means + PQ codes + posting
lists), probe_s is the number users feel per query batch (centroid
probe -> pruned posting scan -> ADC -> fetch -> exact rerank).

Protocol: per scale (x1, x10 replica dirs), one timed cold build, then
warm + median-of-3 probes against the SAME persisted index (the
production shape: indexes are built once, probed forever). Writes
BENCH_ivfpq_split_r15.json.

Usage: python tools/bench_ivfpq_split_r15.py [--x10]
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


def main() -> None:
    import bench
    from bench import SF_DIR, _build_stress_dir

    from nibbledb_spark import get_spark
    from nibbledb_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk_indexed,
    )
    from pyspark.sql import functions as F

    spark = get_spark("ivfpq_split_r15", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    dirs = {1: SF_DIR}
    if "--x10" in sys.argv:
        dirs[10] = _build_stress_dir(
            spark, 10, os.path.join("/tmp", "nibble_stress_sweep")
        )

    out: dict = {
        "metric": "ivfpq_split_r15",
        "unit": "sec",
        "sf": bench.sf_of(SF_DIR),
        "runs": {},
    }
    for mult, d in dirs.items():
        e = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        q = e.where(F.col("vec_id") < 5)
        path = tempfile.mkdtemp(prefix="nibbleivfpq_split_")
        try:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build_ivfpq_index(e, path, n_centroids=8)
            build_s = time.perf_counter() - t0

            def probe() -> int:
                iv = ivfpq_topk_indexed(
                    spark, path, q, 3, nprobe=8,
                    rerank_with=e, n_candidates=1_000_000,
                )
                return len(iv.toPandas())

            n = probe()  # warm (codegen, index footers)
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                probe()
                samples.append(time.perf_counter() - t0)
            probe_s = statistics.median(samples)
            out["runs"][f"x{mult}"] = {
                "build_s": round(build_s, 3),
                "probe_s": round(probe_s, 3),
                "probe_rows": n,
            }
            print(
                f"x{mult}: build {build_s:.2f}s, probe {probe_s:.3f}s "
                f"({n} rows)",
                flush=True,
            )
        finally:
            shutil.rmtree(path, ignore_errors=True)
        with open("BENCH_ivfpq_split_r15.json", "w") as f:
            f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
