"""APPROX-class declared queries: bounds against exact ground truth
(these are never hash-matched against the oracle — SURVEY.md §2 legend)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_bound(spark):
    from nibbledb_spark.queries import PYTEST_ONLY_QUERIES

    approx = (
        PYTEST_ONLY_QUERIES["approx_distinct_parts"](spark, SF)
        .collect()[0]["approx_parts"]
    )
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


def test_ann_recall_floors_on_random_corpus(spark):
    """Deterministic recall@5 of the ANN paths vs exact top-5, measured
    on the driver's UNIFORM-RANDOM embeddings — ANN's worst case (no
    cluster structure for buckets to exploit). Pinned at measured
    floors: IVF nprobe=2/8 ~0.52, nprobe=4/8 ~0.77; SRP ~0.11 on this
    corpus (signed-random-projection buckets only help when neighbors
    share high cosine — see the planted-twin tests for the clustered
    case, where both paths hit rank-1). Everything is deterministic, so
    these are regression floors, not statistical hopes."""
    from pyspark.sql import functions as F

    from nibbledb_spark.operators.similarity import cosine_topk, ivf_topk, srp_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    q = e.where(F.col("vec_id") < 50)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(e, q, 5).collect()}

    def recall(df):
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(got & exact) / len(exact)

    assert recall(ivf_topk(e, q, 5, n_centroids=8, nprobe=2)) >= 0.50
    assert recall(ivf_topk(e, q, 5, n_centroids=8, nprobe=4)) >= 0.75
    assert recall(srp_topk(e, q, 5, dim=64)) >= 0.10


def test_argmax_composite_key_precondition(spark):
    """argmax_latest_order's composite BIGINT ordering key is
    ``epoch_days * 1e10 + o_orderkey`` — exact iff o_orderkey < 1e10
    (TPC-H reaches that around SF ~1700) and the product stays inside
    int64. ADVICE r4 asked for the precondition to be enforced, not
    just documented: pin it on every test SF so a fixture change that
    violates it fails here before it corrupts the driver hash."""
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        mx, days = duckdb.sql(
            "SELECT MAX(o_orderkey), "
            "       MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') "
            f"FROM '{sf}/orders.parquet'"
        ).fetchone()
        assert mx < 10_000_000_000, (sf, mx)
        # key fits int64 with full headroom: days*1e10 + key < 2^63
        assert int(days) * 10_000_000_000 + mx < 2**63, (sf, days, mx)
