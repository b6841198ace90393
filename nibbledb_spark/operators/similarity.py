"""Embedding similarity search (SURVEY.md §2 Part C).

Two paths:

- ``cosine_topk``: brute-force exact top-k. The query set is broadcast;
  the corpus never shuffles; per-partition partial top-k feeds a final
  k-row merge. Dot products are left-fold double arithmetic
  (``F.aggregate`` over ``zip_with``) so results are bit-reproducible
  and oracle-checkable against an identically-ordered fold.
- ``srp_buckets`` / ``srp_topk``: signed-random-projection LSH — the
  scale path. Each vector gets a b-bit signature from fixed
  deterministic hyperplanes; candidates share a signature bucket, and
  exact scoring runs per-bucket only. At 100 TB the bucket join
  replaces the |Q|x|C| cross product with |Q|+|C| shuffled rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double precision (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(_dot(v, v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors per query vector.

    Returns (query_id, neighbor_id, rank, cos_sim). Self-matches are
    excluded; ties break on neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def near_dup_pairs_cosine(
    corpus: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs above a cosine threshold (id1 < id2). Brute-force
    baseline; compose with ``srp_buckets`` for the LSH-bucketed variant."""
    a = corpus.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = corpus.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", cosine(F.col("v1"), F.col("v2")).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# signed-random-projection LSH (scale path)
# ---------------------------------------------------------------------------


def _hyperplane(dim: int, plane_id: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (splitmix-style integer mix
    — fixed across runs/engines, no RNG state)."""
    out = []
    for i in range(dim):
        z = (plane_id * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
        z ^= z >> 31
        out.append((z / 2**64) * 2.0 - 1.0)
    return out


def srp_signature(
    vec_col: Column, dim: int, n_planes: int = 8, plane_offset: int = 0
) -> Column:
    """b-bit signed-random-projection signature as an int column."""
    sig = F.lit(0)
    for b in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, plane_offset + b)])
        bit = F.when(_dot(vec_col, plane) > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = sig + bit
    return sig


def srp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 2,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an SRP bucket
    with the query in any of ``n_tables`` independent hash tables (the
    standard LSH recall lever: P(miss) = (1 - p^b)^L). Rows-only /
    bound-checked (APPROX parity class), never hash-matched."""

    def with_sigs(df: DataFrame, idc: str, vc: str) -> DataFrame:
        cols = [F.col(id_col).alias(idc), F.col(vec_col).alias(vc)]
        for t in range(n_tables):
            sig = srp_signature(F.col(vec_col), dim, n_planes, plane_offset=t * n_planes)
            cols.append(sig.alias(f"sig{t}"))
        return df.select(*cols)

    c = with_sigs(corpus, "neighbor_id", "cv")
    q = with_sigs(queries, "query_id", "qv")
    table_hits = None
    for t in range(n_tables):
        hit = c.join(
            F.broadcast(q.withColumnRenamed(f"sig{t}", "__s")),
            F.col(f"sig{t}") == F.col("__s"),
        ).select("query_id", "neighbor_id", "qv", "cv")
        table_hits = hit if table_hits is None else table_hits.unionByName(hit)
    scored = (
        table_hits.dropDuplicates(["query_id", "neighbor_id"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
