"""Unigram-LM (SentencePiece-style) tokenizer: learn + apply.

The BPE complement (operators/bpe.py): modern pipelines default to
unigram segmentation (Kudo 2018), where a vocabulary of pieces carries
log-probabilities and every word is segmented by the VITERBI-best piece
sequence; training alternates segmentation (E) with count-based
re-scoring (M), pruning pieces that win no usage. The reference
(jptmoore/nibbledb) has no such surface; north-star extension scope.

Engine-exactness design (the hash-matched-oracle problem): true unigram
training needs log p(piece), and libm logs are not reproducible across
engines. Instead scores are SCALED-LONG INTEGER log2 approximations
computed by pure integer arithmetic both engines own:

    Q(n) = LOG_SCALE*(bitlen(n) - 1) + MANT[top-6-mantissa-bits(n)]
    score(piece) = Q(count) - Q(total)            # ~LOG_SCALE*log2(p)

``MANT`` is a static 64-entry table (python-precomputed at import, a
data-independent literal in both dialects — the nDCG-weights trick),
``bitlen`` is the binary-string length (``conv(n,10,2)`` / ``bin(n)``),
and the mantissa index is one shift-divide. Viterbi then maximizes an
INTEGER sum — ties, comparisons, and the argmax are engine-exact.

Parity strategy: every per-word expression (the forward Viterbi fold,
the backtrack fold, Q) is emitted by ONE generator with a
``dialect in ('spark', 'duck')`` switch, so the DataFrame plan and the
DuckDB oracle run literally the same recurrence. DuckDB 1.0 notes that
shaped the encoding: ``list_reduce`` has no init value and mangles
STRUCT accumulators, so folds carry FLAT arrays (position = len(acc);
the backtrack accumulator packs the cursor as element 1, VARCHAR);
negative list indexes wrap python-style, so candidate piece lengths are
filtered BEFORE any ``acc[i-d+1]`` indexing.

Algorithm (all declarative — no driver-side loops, no collects):

1. Word table: one corpus shuffle to (word, cnt); words longer than
   MAX_WORD are excluded from learning (and pass through apply as
   single unsegmented tokens — the rare-tail guard).
2. Seed vocabulary: every substring of length <= MAX_PIECE, summed by
   word frequency; keep the top SEED_TOP by (count DESC, piece) PLUS
   every single character (completeness floor — all words segmentable).
3. ROUNDS hard-EM rounds: Viterbi-segment the distinct-word table with
   the current integer scores (a broadcast single-row piece->score
   map; the DP is a row-local fold, so a round is one tiny vocab
   shuffle — the corpus never reshuffles), count piece usage weighted
   by word frequency, re-score by Q; unused pieces prune out. Each
   word's own best-path pieces survive by construction, so every word
   stays segmentable round over round.
3b. Optional prune-to-target (``vocab_size=``, the SentencePiece
   user contract): keep all single chars + best multi-char pieces up
   to the target, then one more usage+rescore pass under the pruned
   set — counts/scores always describe the final vocabulary.
4. Apply: a ZERO-SHUFFLE projection — per document, segment each word
   with the final scores via the same fold (the BPE apply_bpe scale
   contract: the part that touches all 100 TB is embarrassingly
   parallel). Words whose DP is unreachable under a foreign vocabulary
   fall back to one whole-word token.

Viterbi ties break deterministically: equal-score paths pick the
SHORTEST last piece (smallest d — first match in ascending candidate
order), applied backward from the word end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nibbledb_spark.operators.bpe import _engine_invariant_text

MAX_PIECE = 4
MAX_WORD = 16
SEED_TOP = 256
ROUNDS = 2
LOG_SCALE = 1024
# MANT[m] = round(LOG_SCALE * log2(1 + m/64)) for the top 6 mantissa
# bits — static, data-independent, identical literal in both dialects.
MANT = [int(round(LOG_SCALE * math.log2(1 + m / 64))) for m in range(64)]


def q_log2_expr(n: str, dialect: str) -> str:
    """Integer-exact Q(n) ~ LOG_SCALE*log2(n) for n >= 1 (SQL string).

    bitlen via the binary-string length; mantissa = top 6 bits below
    the leading bit, indexing the static MANT table. Pure integer
    shifts/divides — no libm in either engine.
    """
    tbl = ", ".join(str(v) for v in MANT)
    if dialect == "spark":
        bl = f"length(conv({n}, 10, 2))"
        return (
            f"(CAST({LOG_SCALE} AS BIGINT) * ({bl} - 1) + "
            f"element_at(array({tbl}), CAST(({n} * 64 DIV "
            f"shiftleft(CAST(1 AS BIGINT), {bl} - 1)) - 64 AS INT) + 1))"
        )
    bl = f"length(bin(CAST({n} AS BIGINT)))"
    return (
        f"(CAST({LOG_SCALE} AS BIGINT) * ({bl} - 1) + "
        f"([{tbl}])[CAST(({n} * 64 // "
        f"(CAST(1 AS BIGINT) << ({bl} - 1))) - 64 AS INT) + 1])"
    )


def _fwd_expr(
    w: str, m: str, dialect: str, *, max_piece: int = MAX_PIECE
) -> str:
    """Forward Viterbi fold -> dp array (dp[i+1] = best score of
    segmenting the first i chars; NULL = unreachable). Candidate piece
    lengths are filtered to d <= i BEFORE indexing (DuckDB wraps
    negative indexes python-style)."""
    ds = ", ".join(str(d) for d in range(1, max_piece + 1))
    if dialect == "spark":
        return (
            f"aggregate(sequence(1, length({w})), "
            f"CAST(array(0) AS ARRAY<BIGINT>), (acc, i) -> "
            f"array_append(acc, array_max(filter(transform("
            f"filter(sequence(1, {max_piece}), d -> d <= i), "
            f"d -> try_element_at(acc, i - d + 1) + "
            f"try_element_at({m}, substr({w}, i - d + 1, d))), "
            f"y -> y IS NOT NULL))))"
        )
    return (
        f"list_reduce([[CAST(0 AS BIGINT)]] || "
        f"[CAST([] AS BIGINT[]) for q_ in range(1, length({w}) + 1)], "
        f"(acc, x_) -> acc || [list_max([y for y in "
        f"[acc[len(acc) - d + 1] + "
        f"map_extract({m}, substr({w}, len(acc) - d + 1, d))[1] "
        f"for d in [{ds}] if d <= len(acc)] if y IS NOT NULL])])"
    )


def _bt_expr(
    w: str,
    m: str,
    dialect: str,
    *,
    max_piece: int = MAX_PIECE,
    max_word: int = MAX_WORD,
) -> str:
    """Backtrack fold over the (in-scope) ``dp`` array -> flat VARCHAR
    accumulator [cursor, piece_k, ..., piece_1]; ties pick the smallest
    d (first match ascending). Runs exactly ``max_word`` no-op-padded
    steps."""
    ds = ", ".join(str(d) for d in range(1, max_piece + 1))
    if dialect == "spark":
        d_expr = (
            f"element_at(filter(filter(sequence(1, {max_piece}), "
            f"d -> d <= pos), d -> "
            f"try_element_at(dp, pos - d + 1) + "
            f"try_element_at({m}, substr({w}, pos - d + 1, d)) = "
            f"try_element_at(dp, pos + 1)), 1)"
        )
        step = (
            f"element_at(transform(array(CAST(element_at(acc, 1) AS INT)), "
            f"pos -> CASE WHEN pos <= 0 THEN acc ELSE "
            f"element_at(transform(array({d_expr}), d -> "
            f"concat(array(CAST(pos - d AS STRING)), "
            f"slice(acc, 2, size(acc) - 1), "
            f"array(substr({w}, pos - d + 1, d)))), 1) END), 1)"
        )
        return (
            f"aggregate(sequence(1, {max_word}), "
            f"array(CAST(length({w}) AS STRING)), (acc, z_) -> {step})"
        )
    d_expr = (
        f"[d for d in [d0 for d0 in [{ds}] if d0 <= pos] if "
        f"dp[pos - d + 1] + "
        f"map_extract({m}, substr({w}, pos - d + 1, d))[1] = "
        f"dp[pos + 1]][1]"
    )
    step = (
        f"[CASE WHEN pos <= 0 THEN acc ELSE "
        f"[[CAST(pos - d AS VARCHAR)] || acc[2:] || "
        f"[substr({w}, pos - d + 1, d)] for d in [{d_expr}]][1] END "
        f"for pos in [CAST(acc[1] AS INT)]][1]"
    )
    return (
        f"list_reduce([[CAST(length({w}) AS VARCHAR)]] || "
        f"[CAST([] AS VARCHAR[]) for q_ in range(1, {max_word} + 1)], "
        f"(acc, x_) -> {step})"
    )


def segment_expr(
    w: str,
    m: str,
    dialect: str,
    *,
    max_piece: int = MAX_PIECE,
    max_word: int = MAX_WORD,
) -> str:
    """Pieces array for one word under piece->score map ``m``:
    over-length words and unreachable DPs (foreign-vocabulary apply)
    fall back to one whole-word token. Let-bindings are single-element
    transforms/comprehensions (both dialects lack LET)."""
    fwd = _fwd_expr(w, m, dialect, max_piece=max_piece)
    bt = _bt_expr(w, m, dialect, max_piece=max_piece, max_word=max_word)
    if dialect == "spark":
        pieces = (
            f"element_at(transform(array({bt}), b -> "
            f"reverse(slice(b, 2, size(b) - 1))), 1)"
        )
        return (
            f"CASE WHEN length({w}) > {max_word} THEN array({w}) ELSE "
            f"element_at(transform(array({fwd}), dp -> "
            f"CASE WHEN try_element_at(dp, length({w}) + 1) IS NULL "
            f"THEN array({w}) ELSE {pieces} END), 1) END"
        )
    pieces = f"[list_reverse(b[2:]) for b in [{bt}]][1]"
    return (
        f"CASE WHEN length({w}) > {max_word} THEN [{w}] ELSE "
        f"[CASE WHEN dp[length({w}) + 1] IS NULL THEN [{w}] "
        f"ELSE {pieces} END for dp in [{fwd}]][1] END"
    )


def word_table(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table (word, cnt) — the one corpus
    shuffle of the learn phase (engine-invariant splitting: the BPE
    \\x0B / \\x1F normalization)."""
    return (
        docs.select(
            F.explode(
                F.split(_engine_invariant_text(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _scored_map(vocab: DataFrame, count_col: str) -> DataFrame:
    """One-row piece->score map: score = Q(count) - Q(total) (integer
    log-prob). The total rides an unpartitioned window — the vocab is
    SEED_TOP-bounded, so the single-partition shuffle is trivial."""
    q_c = q_log2_expr(count_col, "spark")
    q_t = q_log2_expr("t", "spark")
    scored = vocab.withColumn(
        "t", F.sum(count_col).over(Window.partitionBy())
    ).select("piece", F.expr(f"{q_c} - {q_t}").alias("score"))
    return scored.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "score"))
        ).alias("m")
    )


def _seed_vocab(
    lw: DataFrame,
    *,
    max_piece: int = MAX_PIECE,
    seed_top: int = SEED_TOP,
) -> DataFrame:
    """Substrings up to ``max_piece`` summed by word frequency: top
    ``seed_top`` by (count DESC, piece) plus ALL single characters
    (the completeness floor)."""
    subs = F.expr(
        f"flatten(transform(sequence(1, length(word)), s -> "
        f"transform(sequence(s, least(length(word), s + {max_piece - 1})), "
        f"e -> substr(word, s, e - s + 1))))"
    )
    seeds = (
        lw.select("cnt", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
    )
    rn = F.row_number().over(
        Window.orderBy(F.col("c").desc(), F.col("piece").asc())
    )
    return (
        seeds.withColumn("rn", rn)
        .where((F.col("rn") <= seed_top) | (F.length("piece") == 1))
        .select("piece", "c")
    )


def learn_unigram(
    docs: DataFrame,
    *,
    rounds: int = ROUNDS,
    vocab_size: int | None = None,
    max_piece: int = MAX_PIECE,
    max_word: int = MAX_WORD,
    seed_top: int = SEED_TOP,
    text_col: str = "text",
) -> DataFrame:
    """Learn the unigram vocabulary: (piece, n_uses, score) after
    ``rounds`` hard-EM rounds, ordered (n_uses DESC, piece). Fully
    declarative — each round is one broadcast of the one-row score map
    plus one piece-keyed count shuffle over the DISTINCT-WORD table
    (corpus-scale data is touched exactly once, by word_table).

    ``vocab_size`` is the SentencePiece-style prune-to-target control
    (its primary user contract): after the EM rounds, keep the FULL
    single-character alphabet of the word table (required-character
    coverage — every word stays segmentable; chars EM starved of
    usage rejoin at the count floor 1) plus the best-used multi-char
    pieces up to ``vocab_size`` total, then run ONE more usage+rescore
    pass under the pruned piece set so the returned counts and scores
    describe the FINAL vocabulary (SentencePiece likewise re-estimates
    after each prune). Pieces that lose all usage in that final pass
    drop out, so the result can come in under target — never over
    (unless the alphabet alone exceeds it). ``None`` keeps the
    un-pruned EM result (the declared-query/ledger setting).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1: {rounds}")
    if vocab_size is not None and vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1: {vocab_size}")
    lw = word_table(docs, text_col=text_col).where(
        F.length("word") <= max_word
    )
    seg = segment_expr(
        "word", "m", "spark", max_piece=max_piece, max_word=max_word
    )
    vocab_map = _scored_map(
        _seed_vocab(lw, max_piece=max_piece, seed_top=seed_top), "c"
    )

    def em_pass(vmap: DataFrame) -> DataFrame:
        return (
            lw.crossJoin(F.broadcast(vmap))
            .select("cnt", F.explode(F.expr(seg)).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").alias("n_uses"))
        )

    usage = None
    for _ in range(rounds):
        usage = em_pass(vocab_map)
        vocab_map = _scored_map(usage, "n_uses")
    if vocab_size is not None:
        # prune-to-target with REQUIRED-CHARACTER COVERAGE: the floor
        # is the full single-char alphabet of the word table — not
        # just chars still in usage (EM lets a char lose every use to
        # multi-char pieces; pruning those away would orphan words,
        # whose whole-word fallbacks then re-enter the count as
        # rogue "pieces" and blow the target). Chars that lost all
        # usage rejoin at the count floor 1 (SentencePiece likewise
        # pins required chars at minimal probability); multi-char
        # pieces rank (n_uses DESC, piece ASC) into the remaining
        # budget. Both frames are alphabet/seed_top-bounded, so the
        # unpartitioned windows are trivial — only the final em_pass
        # touches the word table again.
        alpha = (
            lw.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(word)), "
                        "i -> substr(word, i, 1))"
                    )
                ).alias("piece")
            )
            .distinct()
            .join(usage, "piece", "left")
            .select(
                "piece",
                F.coalesce("n_uses", F.lit(1)).alias("n_uses"),
                F.lit(1).alias("ic"),
            )
        )
        multi = usage.where(F.length("piece") > 1).select(
            "piece", "n_uses", F.lit(0).alias("ic")
        )
        both = alpha.unionByName(multi)
        n_chars = F.sum("ic").over(Window.partitionBy())
        rn = F.row_number().over(
            Window.partitionBy("ic").orderBy(
                F.col("n_uses").desc(), F.col("piece").asc()
            )
        )
        kept = (
            both.withColumn("nc", n_chars)
            .withColumn("rn", rn)
            .where(
                (F.col("ic") == 1)
                | (F.col("rn") <= F.greatest(
                    F.lit(vocab_size) - F.col("nc"), F.lit(0)
                ))
            )
            .select("piece", "n_uses")
        )
        usage = em_pass(_scored_map(kept, "n_uses"))
    q_c = q_log2_expr("n_uses", "spark")
    q_t = q_log2_expr("t", "spark")
    return (
        usage.withColumn("t", F.sum("n_uses").over(Window.partitionBy()))
        .select(
            "piece", "n_uses", F.expr(f"{q_c} - {q_t}").alias("score")
        )
        .orderBy(F.col("n_uses").desc(), F.col("piece").asc())
    )


def tokenize_unigram(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece: int = MAX_PIECE,
    max_word: int = MAX_WORD,
) -> DataFrame:
    """Viterbi-tokenize every document with a learned (piece, score)
    vocabulary: ONE zero-shuffle projection over the corpus (the
    one-row score map broadcasts; each word's DP is a row-local fold).
    Returns (id_col, n_tokens, tok_str), tokens space-joined in
    document order."""
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "score"))
        ).alias("m")
    )
    seg = segment_expr(
        "w", "m", "spark", max_piece=max_piece, max_word=max_word
    )
    toks = F.expr(
        f"flatten(transform(filter(split(_norm, '\\\\s+'), "
        f"w0 -> w0 != ''), w -> {seg}))"
    )
    return (
        docs.select(
            F.col(id_col),
            # coalesce NULL text to '' so the Spark side matches the
            # oracle's LEFT-JOIN shaping (n_tokens 0, tok_str '') —
            # size(NULL) would otherwise yield NULL/-1 and hash-fail
            _engine_invariant_text(
                F.coalesce(F.col(text_col), F.lit(""))
            ).alias("_norm"),
        )
        .crossJoin(F.broadcast(vmap))
        .select(
            F.col(id_col),
            F.size(toks).cast("long").alias("n_tokens"),
            F.array_join(toks, " ").alias("tok_str"),
        )
    )
