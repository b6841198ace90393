"""Learn-loop K-scaling measurement (round-14 verdict task 3).

The r14 verdict accepted the design stance — tokenizer LEARN phases are
driver-paced rounds over the tiny word table, APPLY is the zero-shuffle
100 TB corpus pass — but flagged that the per-round cost floor
(~0.5 s/round) was extrapolated from K=8 merges / rounds=2. This
measures the claim directly on the x10 replica corpus:

- ``learn_bpe_merges`` at K = 8, 16, 32, 64: each merge round is ONE
  argmax job over the cached word table, but the round-r frame carries
  the (r-1)-deep replace chain, so per-round cost is expected to grow
  ~linearly in r (O(K^2) total expression work + plan growth) on top
  of the flat scheduling floor.
- ``learn_unigram`` at rounds = 1, 2, 4 (plus one vocab_size-pruned
  sitting): each round re-broadcasts the one-row score map; per-round
  cost should be flat (the segmentation fold does not deepen).

Writes BENCH_learn_r15.json: total seconds, marginal per-round cost
between consecutive sittings, and the produced vocab/merge counts.

Usage: python tools/bench_learn_scaling_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from bench import SF_DIR, _build_stress_dir

    from nibbledb_spark import get_spark
    from nibbledb_spark.operators.bpe import learn_bpe_merges
    from nibbledb_spark.operators.unigram import learn_unigram

    spark = get_spark("learn_r15", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    x10 = _build_stress_dir(spark, 10, "/tmp/nibble_stress_sweep")
    docs = spark.read.parquet(os.path.join(x10, "documents.parquet"))

    out: dict = {
        "metric": "learn_scaling_r15",
        "unit": "sec",
        "sf": bench.sf_of(SF_DIR),
        "corpus": "x10 replica documents",
        "runs": {},
    }

    def flush() -> None:
        with open("BENCH_learn_r15.json", "w") as f:
            f.write(json.dumps(out) + "\n")

    prev_s, prev_k = 0.0, 0
    for k in (8, 16, 32, 64):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        merges = learn_bpe_merges(docs, k)
        dt = time.perf_counter() - t0
        marginal = (dt - prev_s) / (k - prev_k) if k > prev_k else None
        out["runs"][f"bpe_k{k}"] = {
            "s": round(dt, 3),
            "merges": len(merges),
            "s_per_merge": round(dt / max(len(merges), 1), 3),
            "marginal_s_per_merge": (
                round(marginal, 3) if marginal is not None else None
            ),
        }
        prev_s, prev_k = dt, k
        flush()
        print(f"bpe k={k}: {dt:.2f}s ({len(merges)} merges)", flush=True)

    prev_s, prev_r = 0.0, 0
    for r in (1, 2, 4):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        vocab = learn_unigram(docs, rounds=r).collect()
        dt = time.perf_counter() - t0
        marginal = (dt - prev_s) / (r - prev_r) if r > prev_r else None
        out["runs"][f"unigram_rounds{r}"] = {
            "s": round(dt, 3),
            "vocab": len(vocab),
            "s_per_round": round(dt / r, 3),
            "marginal_s_per_round": (
                round(marginal, 3) if marginal is not None else None
            ),
        }
        prev_s, prev_r = dt, r
        flush()
        print(f"unigram rounds={r}: {dt:.2f}s ({len(vocab)} pieces)", flush=True)

    # the pruned path adds exactly one extra EM pass over rounds=2
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    vocab = learn_unigram(docs, rounds=2, vocab_size=64).collect()
    dt = time.perf_counter() - t0
    out["runs"]["unigram_rounds2_vs64"] = {
        "s": round(dt, 3),
        "vocab": len(vocab),
    }
    flush()
    print(f"unigram rounds=2 vocab_size=64: {dt:.2f}s ({len(vocab)})", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
