"""Composed corpus-cleaning pipeline (SURVEY.md §2 Part C).

The canonical LLM-training-data pass, assembled from the engine's
primitive operators into ONE declarative plan Catalyst optimizes as a
whole — no intermediate materialization, no driver-side loops:

    quality filter -> language filter -> exact dedup -> near-dup removal

Every stage is deterministic (fixed scoring formulas, min-id winners,
exact n-gram Jaccard), so the full pipeline is replicated in DuckDB SQL
and hash-checked end-to-end — the property that makes a 100 TB cleaning
run auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nibbledb_spark.operators.dedup import ngram_jaccard_pairs
from nibbledb_spark.operators.text import lang_id, quality_scores


def clean_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    min_stopword_ratio: float = 0.03,
    lang: str = "en",
    near_dup_threshold: float = 0.5,
) -> DataFrame:
    """Surviving document ids after the four cleaning stages.

    - quality: ``n_tokens >= min_tokens`` and
      ``stopword_ratio >= min_stopword_ratio`` (garbage text has few
      stopwords);
    - language: marker-heuristic prediction equals ``lang``;
    - exact dedup: one winner (min id) per identical text;
    - near-dup: for every exact-surviving pair with trigram Jaccard >=
      ``near_dup_threshold``, the higher id is dropped.

    Scale shape: two hash aggregates (quality+dedup), one shingle
    equi-join for near-dups — all shuffles keyed, nothing quadratic.
    """
    q = quality_scores(docs, text_col).select(
        id_col, "n_tokens", "stopword_ratio"
    )
    lg = lang_id(docs, text_col).select(id_col, "lang_pred")
    keep0 = (
        docs.join(q, id_col)
        .join(lg, id_col)
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("stopword_ratio") >= min_stopword_ratio)
            & (F.col("lang_pred") == lang)
        )
        .select(id_col, text_col)
    )
    exact = keep0.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    pairs = ngram_jaccard_pairs(
        exact, id_col=id_col, text_col=text_col, threshold=near_dup_threshold
    )
    removed = pairs.select(F.col("id2").alias(id_col)).distinct()
    return (
        exact.select(id_col)
        .join(removed, id_col, "left_anti")
        .orderBy(id_col)
    )
