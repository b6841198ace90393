"""Boilerplate-skew stress for the dedup candidate-join family
(round-13 verdict task 7): inject one boilerplate sentence into 50% of
documents — its shingles then have df = corpus/2, and an uncapped
shingle equi-join's candidate volume goes quadratic (sum over shingles
of C(df, 2)) — and measure that the max_doc_freq stop-shingle cap
bounds the join input back to corpus-linear.

Records, per scale:
- candidate volume (sum C(df,2) over the shingle table — computed by
  one aggregate, no join) uncapped vs capped,
- wall time of ngram_jaccard_pairs capped (and uncapped where the
  volume permits — the sf0.1 uncapped join is ~2e9 candidates, exactly
  the blowup the cap exists to prevent, so it is reported analytically
  rather than executed).

The recall trade (boilerplate-only pairs dropped, genuine near-dups
kept) is pytest-pinned in test_extensions.py. Writes
BENCH_boilerplate_r14.json.

Usage: python tools/bench_boilerplate_r14.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = (
    "subscribe to our newsletter for updates and offers today "
    "all rights reserved terms of service apply"
)
CAP = 200


def main() -> None:
    from pyspark.sql import functions as F

    from nibbledb_spark import get_spark
    from nibbledb_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_rows,
    )

    spark = get_spark("boilerplate_r14", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict = {
        "metric": "boilerplate_skew_stress",
        "unit": "candidates/sec",
        "cap": CAP,
        "boiler_frac": 0.5,
        "scales": {},
    }

    for sf in ("sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        skewed = docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit(BOILER + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        ).persist()
        n_docs = skewed.count()

        dfs = (
            shingle_rows(skewed)
            .groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .persist()
        )

        def volume(max_df=None):
            d = dfs if max_df is None else dfs.where(F.col("df") <= max_df)
            v = d.agg(
                F.sum((F.col("df") * (F.col("df") - 1) / 2).cast("long"))
            ).collect()[0][0]
            return int(v or 0)

        vol_un, vol_cap = volume(None), volume(CAP)
        rec = {
            "n_docs": n_docs,
            "candidates_uncapped": vol_un,
            "candidates_capped": vol_cap,
            "blowup_x": round(vol_un / max(vol_cap, 1), 1),
        }

        def timed(max_doc_freq):
            q = ngram_jaccard_pairs(
                skewed, threshold=0.5, max_doc_freq=max_doc_freq
            )
            n = q.count()  # warm
            samples = []
            for _ in range(3):
                spark.catalog.clearCache()
                skewed.persist().count()
                t0 = time.perf_counter()
                n = ngram_jaccard_pairs(
                    skewed, threshold=0.5, max_doc_freq=max_doc_freq
                ).count()
                samples.append(time.perf_counter() - t0)
            return statistics.median(samples), n

        t_cap, n_cap = timed(CAP)
        rec["capped_s"] = round(t_cap, 3)
        rec["capped_pairs"] = n_cap
        if vol_un <= 50_000_000:  # execute the blowup only where sane
            t_un, n_un = timed(None)
            rec["uncapped_s"] = round(t_un, 3)
            rec["uncapped_pairs"] = n_un
        out["scales"][sf] = rec
        print(sf, rec, flush=True)
        dfs.unpersist()
        skewed.unpersist()
        spark.catalog.clearCache()

    with open("BENCH_boilerplate_r14.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
