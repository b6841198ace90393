"""Hand-computed semantic pins for the round-13 retrieval/eval/smoothing
operators. The DuckDB oracles prove ENGINE parity (both engines compute
the same thing); these prove the thing computed is the intended
definition, on inputs small enough to verify by hand.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_mmr_prefers_diverse_over_redundant(spark):
    """Corpus built so plain top-2 picks two near-identical vectors but
    MMR's second slot goes to the diverse direction. Geometry note:
    the diverse doc must be ANTI-correlated with the first pick, not
    merely off-axis — when the first pick is ~parallel to the query,
    sim(c, first) ~ rel(c) and no λ can prefer c. Here:
    rel(a) ~ rel(b) ~ 0.9, sim(a, b) ~ 1, rel(c) = 0.6,
    sim(c, a) ~ 0.19 → round-2 scores 7·0.9 − 3·1 = 3.3 for b vs
    7·0.6 − 3·0.19 ~ 3.63 for c."""
    from nibbledb_spark.operators.similarity import cosine_topk, mmr_topk

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 6

    rows = [
        (0, vec(1.0, 0.0)),        # the query
        (1, vec(0.9, 0.436)),      # a: rel ~ 0.9
        (2, vec(0.9, 0.44)),       # b: rel ~ 0.9, near-duplicate of a
        (3, vec(0.6, -0.8)),       # c: rel = 0.6, anti-correlated with a
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.where(F.col("vec_id") == 0)

    plain = [
        r["neighbor_id"]
        for r in cosine_topk(e, q, 2).orderBy("rank").collect()
    ]
    assert plain == [1, 2]  # top-2 by relevance alone: the redundant pair

    got = {
        r["mmr_rank"]: r["neighbor_id"]
        for r in mmr_topk(e, q, 2, pool_size=3).collect()
    }
    assert got[1] == 1  # first pick = plain argmax
    assert got[2] == 3  # second pick = the DIVERSE doc, not the near-dup


def test_mmr_validates_arguments(spark):
    from nibbledb_spark.operators.similarity import mmr_topk

    e = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="proper positive fraction"):
        mmr_topk(e, e, 1, lam=(11, 10))
    with pytest.raises(ValueError, match="k <= pool_size"):
        mmr_topk(e, e, 5, pool_size=3)


def test_retrieval_metrics_hand_computed(spark):
    """One query, run ranks [d1..d4], relevant = {d2, d4, d9}:
    hits@4 = 2, recall = 2/3, mrr = 1/2 (first hit at rank 2),
    DCG = w2 + w4, IDCG = w1 + w2 + w3 (3 relevant, all < k)."""
    from nibbledb_spark.operators.similarity import (
        _NDCG_SCALE,
        _NDCG_W,
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2), (7, 3, 3), (7, 4, 4)],
        "query_id long, neighbor_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(7, 2), (7, 4), (7, 9)], "query_id long, doc_id long"
    )
    row = retrieval_metrics(run, qrels, k=4).collect()[0]
    assert row["n_rel"] == 3 and row["hits_at_k"] == 2
    assert row["first_rel_rank"] == 2
    assert row["recall_at_k"] == pytest.approx(2 / 3)
    assert row["mrr"] == 0.5
    want_ndcg = (_NDCG_W[1] + _NDCG_W[3]) / (_NDCG_W[0] + _NDCG_W[1] + _NDCG_W[2])
    assert row["ndcg_at_k"] == pytest.approx(want_ndcg)
    # sanity: the quantized weights ARE 1/log2(rank+1) to ~1e-12
    for i, w in enumerate(_NDCG_W[:4], start=1):
        assert w / _NDCG_SCALE == pytest.approx(1 / math.log2(i + 1), rel=1e-9)


def test_retrieval_metrics_no_hits_and_missing_query(spark):
    from nibbledb_spark.operators.similarity import retrieval_metrics

    run = spark.createDataFrame(
        [(7, 1, 1), (8, 1, 1)], "query_id long, neighbor_id long, rank long"
    )
    # query 7 has judgments but no hits; query 8 has NO judgments at all
    qrels = spark.createDataFrame([(7, 99)], "query_id long, doc_id long")
    rows = retrieval_metrics(run, qrels, k=4).collect()
    assert [r["query_id"] for r in rows] == [7]  # unjudged query dropped
    r = rows[0]
    assert r["hits_at_k"] == 0 and r["first_rel_rank"] == 0
    assert r["recall_at_k"] == 0.0 and r["mrr"] == 0.0 and r["ndcg_at_k"] == 0.0


def test_ewma_hand_computed(spark):
    """Series [10, 20, 40]: truncated-adjusted halving EWMA
    y1 = 10, y2 = (10*1 + 20*2)/3, y3 = (10*1 + 20*2 + 40*4)/7."""
    from nibbledb_spark.operators.timeseries import ewma

    pts = spark.createDataFrame(
        [("s", 1, 10.0), ("s", 2, 20.0), ("s", 3, 40.0)],
        "series string, ts long, value double",
    )
    got = {
        r["ts"]: r["ewma"] for r in ewma(pts, window=20).collect()
    }
    assert got[1] == pytest.approx(10.0)
    assert got[2] == pytest.approx(50 / 3)
    assert got[3] == pytest.approx(210 / 7)

    # window truncation: with window=2 the third point forgets the first
    got2 = {
        r["ts"]: r["ewma"] for r in ewma(pts, window=2).collect()
    }
    assert got2[3] == pytest.approx((20 * 1 + 40 * 2) / 3)
    with pytest.raises(ValueError, match="window"):
        ewma(pts, window=0)
