"""APPROX-class declared queries: bounds against exact ground truth
(these are never hash-matched against the oracle — SURVEY.md §2 legend)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_bound(spark):
    from nibbledb_spark.queries import QUERIES

    approx = QUERIES["approx_distinct_parts"](spark, SF).collect()[0]["approx_parts"]
    exact = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()[0]["n"]
    )
    assert abs(approx - exact) / exact <= 0.05  # rsd=0.02 -> 5% is generous


def test_srp_ann_results_are_valid_neighbors(spark):
    """srp_ann_topk (rows-only): every reported neighbor must be a real
    corpus vector, distinct from its query, ranked by its true cosine."""
    from nibbledb_spark.queries import QUERIES

    rows = QUERIES["srp_ann_topk"](spark, SF).collect()
    assert rows, "SRP must return candidates at sf0.01"
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert -1.0 <= r["cos_sim"] <= 1.0
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for q, items in per_q.items():
        items.sort()
        sims = [s for _, s in items]
        assert sims == sorted(sims, reverse=True), q  # rank order == cosine order
