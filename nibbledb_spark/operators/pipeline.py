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
from nibbledb_spark.operators.text import quality_lang_keep, tokens

# Stop-shingle doc-frequency cap, ON by default. A shingle shared by d
# documents contributes d*(d-1)/2 rows to the candidate join; boilerplate
# shingles (license headers, nav chrome) reach millions of docs at corpus
# scale and make the join group quadratic. 256 bounds any one shingle's
# contribution at ~32k pairs while leaving genuinely discriminative
# shingles (the ones that signal near-duplication) untouched. The cap is
# deterministic (a doc-freq filter), so the DuckDB oracle models it
# exactly — capped != approximate.
DEFAULT_MAX_SHINGLE_DF = 256


def clean_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    min_stopword_ratio: float = 0.03,
    lang: str = "en",
    near_dup_threshold: float = 0.5,
    max_shingle_doc_freq: int | None = DEFAULT_MAX_SHINGLE_DF,
    max_top_bigram_fraction: float | None = None,
) -> DataFrame:
    """Surviving document ids after the four cleaning stages.

    - quality: ``n_tokens >= min_tokens`` and
      ``stopword_ratio >= min_stopword_ratio`` (garbage text has few
      stopwords);
    - language: marker-heuristic prediction equals ``lang``;
    - exact dedup: one winner (min id) per identical text;
    - near-dup: for every exact-surviving pair with trigram Jaccard >=
      ``near_dup_threshold``, the higher id is dropped.

    ``max_shingle_doc_freq`` (default :data:`DEFAULT_MAX_SHINGLE_DF`) drops
    shingles present in more than that many documents before the candidate
    join — the skew guard that keeps the near-dup stage linear-ish at
    100 TB. Jaccard is then computed over the capped shingle universe
    (sizes and intersections both exclude hot shingles), which the oracle
    SQL replicates term for term. Pass ``None`` for the uncapped exact
    variant (the ``ngram_jaccard_pairs`` declared query keeps that
    semantics).

    Scale shape: two hash aggregates (quality+dedup), one shingle
    equi-join for near-dups — all shuffles keyed, nothing quadratic.
    """
    # quality + language stay row-local (no joins, no extra scans —
    # exchange budget pinned in tests/test_plans.py) but the expensive
    # token-array scores are STAGED in a projection below the filter so
    # each evaluates once per row instead of once per CASE comparison
    # (0.84 -> 0.57 s per cold corpus pass at sf0.1; see
    # text.quality_lang_keep — r15 opt)
    keep0 = quality_lang_keep(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_tokens=min_tokens,
        min_stopword_ratio=min_stopword_ratio,
        lang=lang,
    )
    if max_top_bigram_fraction is not None:
        # Gopher-style repetition gate: drop docs whose most frequent
        # word bigram covers more than the threshold of all bigram
        # occurrences. Aggregated per doc (can't be row-local): lead-
        # window bigrams -> two hash aggs -> broadcastable per-doc
        # fraction joined back onto the survivors.
        from pyspark.sql import Window

        toks = docs.select(
            F.col(id_col).alias("__id"), F.posexplode(tokens(text_col)).alias("__pos", "__tok")
        )
        wseq = Window.partitionBy("__id").orderBy("__pos")
        bs = (
            toks.withColumn("__nxt", F.lead("__tok").over(wseq))
            .where(F.col("__nxt").isNotNull())
            .groupBy("__id", F.concat_ws(" ", "__tok", "__nxt").alias("__bg"))
            .agg(F.count("*").alias("__c"))
            .groupBy("__id")
            .agg((F.max("__c").cast("double") / F.sum("__c")).alias("__f"))
            .where(F.col("__f") <= max_top_bigram_fraction)
            .select(F.col("__id").alias(id_col))
        )
        keep0 = keep0.join(bs, id_col)
    exact = keep0.groupBy(text_col).agg(F.min(id_col).alias(id_col))
    pairs = ngram_jaccard_pairs(
        exact,
        id_col=id_col,
        text_col=text_col,
        threshold=near_dup_threshold,
        max_doc_freq=max_shingle_doc_freq,
    )
    removed = pairs.select(F.col("id2").alias(id_col)).distinct()
    return (
        exact.select(id_col)
        .join(removed, id_col, "left_anti")
        .orderBy(id_col)
    )


def prep_training_mix(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    budget: int = 512,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.25,
    **clean_kwargs,
) -> DataFrame:
    """The full training-data prep pass as ONE declarative plan:

        clean_corpus (quality -> lang -> exact dedup -> near-dup)
        -> stratified sampling (deterministic md5-threshold mixing)
        -> sequence packing (per-source token-budget offsets)

    Returns per surviving sampled document its packing coordinates
    (n_tokens, start_offset, pack_id, straddles). Every stage is
    deterministic, so the composition is replicated in DuckDB SQL and
    hash-audited end-to-end — the same auditability story as
    clean_corpus, extended to the mix that actually reaches training.
    """
    from nibbledb_spark.operators.packing import pack_sequences
    from nibbledb_spark.operators.sampling import sample_stratified

    surviving = clean_corpus(
        docs, id_col=id_col, text_col=text_col, **clean_kwargs
    )
    kept = docs.join(surviving, id_col, "left_semi")
    sampled = sample_stratified(
        kept,
        rates or {},
        stratum_col=source_col,
        key_col=id_col,
        default_rate=default_rate,
    )
    return pack_sequences(
        sampled, budget, id_col=id_col, text_col=text_col, group_col=source_col
    )


def assign_training_shards(
    docs: DataFrame,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic export sharding: every document gets a stable
    ``shard`` in [0, n_shards) from its id hash (content-independent, so
    shards are statistically balanced in docs AND tokens), plus its
    ``n_tokens``. Writing the result ``partitionBy("shard")`` yields the
    fixed-fan-out training export layout; the hash is the md5-prefix
    integer used across the sampling operators (engine-portable, so the
    manifest is oracle-checkable)."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    return docs.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int")).withColumn(
        "n_tokens", F.size(F.split(F.col(text_col), r"\s+"))
    )


def shard_manifest(sharded: DataFrame) -> DataFrame:
    """Per-shard manifest (shard, n_docs, n_tokens) — the export audit
    record a training run checks before consuming the shards."""
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def clean_ingest_sink(
    log,
    *,
    key_expr: str = "md5(text)",
    min_quality: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_id: str = "clean",
    keep_empty: bool = False,
):
    """``foreachBatch`` handler for CONTINUOUS quality-gated ingest —
    the streaming form of ``clean_corpus`` for a crawl loop: each
    micro-batch is scored by the hash-trick linear classifier
    (text.linear_quality_score, a zero-shuffle projection), rows under
    ``min_quality`` drop, and the survivors flow through the table's
    exactly-once exact-dedup sink (``SnapshotLog.dedup_streaming_sink``:
    first-occurrence-in-batch + anti-join against the committed
    corpus, batch-id replay guard).

    The composition inherits every guarantee of its parts: a replayed
    micro-batch commits nothing, the gate is deterministic (same
    batch -> same survivors on any engine or partitioning), and at
    100 TB the added cost over raw dedup ingest is one codegen'd
    projection over the batch — the corpus is never rescored.

    Zero-token documents score NULL (no tokens, no dot product) and
    are DROPPED by default — empty text is junk in a quality-gated
    ingest, but the policy is explicit, not an accident of NULL
    comparison semantics: pass ``keep_empty=True`` to let them through
    to the dedup stage instead (round-9 self-review).

    ``log``: a SnapshotLog. Returns the handler for
    ``writeStream.foreachBatch(...)``.
    """
    from nibbledb_spark.operators.text import linear_quality_score

    inner = log.dedup_streaming_sink(key_expr, stream_id)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        scores = linear_quality_score(batch_df, id_col=id_col, text_col=text_col)
        gate = F.col("lin_score") >= min_quality
        if keep_empty:
            gate = gate | F.col("lin_score").isNull()
        keep = scores.where(gate).select(F.col("id").alias(id_col))
        inner(batch_df.join(keep, id_col, "left_semi"), batch_id)

    return sink
