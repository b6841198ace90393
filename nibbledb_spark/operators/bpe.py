"""Byte-pair-encoding merge learning + corpus tokenization (SURVEY.md
§2 Part C extensions; round-7 verdict punch item 4 — the one LLM
pipeline stage between heavy-hitter token counts and sequence packing
the engine lacked).

The reference (jptmoore/nibbledb) has no such surface; north-star
extension scope.

Design — the classic word-frequency trick (Sennrich et al. 2016), laid
out for Spark's execution model:

1. The corpus shuffles ONCE into a distinct-word frequency table
   (``word -> cnt``). Everything iterative happens on that small table;
   the corpus itself never reshuffles.
2. Each word is represented as a separator-wrapped symbol string:
   ``⟂c⟂⟂a⟂⟂t⟂`` (one ``⟂sym⟂`` wrapper per symbol, U+001F separator,
   stripped from the input text first). With this encoding, applying a
   merge ``(A, B)`` is ONE built-in ``replace(w, '⟂A⟂⟂B⟂', '⟂AB⟂')`` —
   and because SQL ``replace`` scans left-to-right, non-overlapping,
   that single call IS exact greedy BPE merge application (for A != B
   adjacent sites never overlap; for A == B runs the leftmost-first
   every-other rule falls out of the scan resuming after each
   replacement). The same call with the same semantics exists in
   DuckDB, so the oracle replays learning exactly, round by round.
3. A learning round = one pair-count aggregation over the word table
   (adjacent-symbol explode weighted by word count) + a deterministic
   argmax (count DESC, lhs ASC, rhs ASC) collected to the driver (one
   row per round — the same accepted iterative-driver pattern as the
   k-means Lloyd rounds in similarity.py). The driver loop carries only
   the K merge pairs, never data.
4. ``apply_bpe`` tokenizes the full corpus by wrapping whole documents
   (word boundaries stay bare whitespace, which no ``⟂A⟂⟂B⟂`` pattern
   can cross) and chaining the K learned replaces — a pure codegen'd
   projection with ZERO shuffles and no Python in the row path. At
   100 TB this is the part that touches all the data, and it is
   embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # U+001F unit separator; stripped from input text first

# Vertical tab is whitespace to Java's \s (Spark) but NOT to RE2's \s
# (DuckDB): a document containing \x0B would word-split differently on
# the two engines and break oracle parity. Normalize it to a plain
# space alongside the SEP strip so splitting is engine-invariant —
# \x0B is the ONLY char the two ASCII \s classes disagree on.
_VTAB = "\x0b"


def _engine_invariant_text(text_col):
    return F.replace(
        F.replace(text_col, F.lit(_VTAB), F.lit(" ")), F.lit(SEP), F.lit("")
    )

# Spark-side building blocks (the DuckDB oracle mirrors each expression
# 1:1 in nibbledb_spark/queries.py — keep them in sync).


def _wrap_words(text_col, pattern: str = r"(\S)"):
    """Wrap every matched char as ``⟂c⟂``: adjacent wrapped chars meet
    as ``⟂⟂``, unmatched chars (whitespace) stay bare so merges never
    cross word boundaries."""
    clean = _engine_invariant_text(text_col)
    return F.regexp_replace(clean, pattern, f"{SEP}$1{SEP}")


def word_table(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table ``(cnt, w)`` with ``w`` wrapped —
    the one corpus shuffle of the whole learn phase."""
    words = docs.select(
        F.explode(
            F.split(_engine_invariant_text(F.col(text_col)), r"\s+")
        ).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("cnt")).select(
        "cnt", F.regexp_replace("word", r"(.)", f"{SEP}$1{SEP}").alias("w")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the word table, weighted by
    word frequency. ``slice(.., size-1)`` yields [] for single-symbol
    words (never the descending-sequence trap: slice length 0 is [])."""
    syms = F.split(F.expr(f"trim(BOTH '{SEP}' FROM w)"), SEP + SEP)
    pairs = F.arrays_zip(
        F.expr("slice(syms, 1, size(syms) - 1)").alias("lhs"),
        F.expr("slice(syms, 2, size(syms) - 1)").alias("rhs"),
    )
    return (
        words.select("cnt", syms.alias("syms"))
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _merge_expr(col, lhs: str, rhs: str):
    return F.replace(
        col,
        F.lit(f"{SEP}{lhs}{SEP}{SEP}{rhs}{SEP}"),
        F.lit(f"{SEP}{lhs}{rhs}{SEP}"),
    )


def learn_bpe_merges(
    docs: DataFrame, k: int, *, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Learn ``k`` BPE merges; returns ``[(rank, lhs, rhs, count)]``.

    Iterative by nature (merge k+1 depends on merge k); each round is
    one Spark aggregation on the persisted word table plus a 1-row
    collect. Ties break deterministically (count DESC, lhs, rhs)."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    base = word_table(docs, text_col=text_col).persist()
    try:
        merges: list[tuple[int, str, str, int]] = []
        words = base
        for rank in range(1, k + 1):
            # ONE job per round: the argmax. Each round's frame is the
            # cached base plus the (rank-1) replace chain so far — the
            # chain re-evaluates per round, but it is a handful of
            # codegen'd string ops over the cached vocabulary, far
            # cheaper than materializing an intermediate cache per
            # round (measured 3 jobs/round -> 1: learn wall time is
            # scheduler-latency-bound, not compute-bound).
            best = (
                _pair_counts(words)
                .orderBy(F.desc("pair_count"), "lhs", "rhs")
                .limit(1)
                .collect()
            )
            if not best:
                break  # vocabulary exhausted before k merges
            lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], best[0]["pair_count"]
            merges.append((rank, lhs, rhs, int(cnt)))
            words = words.select("cnt", _merge_expr(F.col("w"), lhs, rhs).alias("w"))
        return merges
    finally:
        base.unpersist()


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize every document with the learned merges, in merge order.

    One zero-shuffle projection: wrap the whole document (whitespace
    stays bare, so no merge crosses a word boundary), chain the K
    ``replace`` calls, unwrap, and split into tokens. Returns
    ``(id_col, n_tokens, tok_str)`` with tokens space-joined."""
    wrapped = _wrap_words(F.col(text_col))
    for _, lhs, rhs, _ in merges:
        wrapped = _merge_expr(wrapped, lhs, rhs)
    # ⟂⟂ between tokens -> space; the leftover single ⟂ at word edges drops.
    unwrapped = F.replace(
        F.replace(wrapped, F.lit(SEP + SEP), F.lit(" ")), F.lit(SEP), F.lit("")
    )
    toks = F.filter(F.split(unwrapped, r"\s+"), lambda x: x != "")
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_join(toks, " ").alias("tok_str"),
    )


def save_bpe_merges(merges: list[tuple[int, str, str, int]], path: str) -> None:
    """Persist learned merges as the tokenizer artifact (train once,
    apply many — the apply side is a pure projection, so a saved merge
    list is everything a 1000-executor tokenize job needs)."""
    import json

    with open(path, "w") as f:
        json.dump(
            [
                {"rank": r, "lhs": lhs, "rhs": rhs, "count": c}
                for r, lhs, rhs, c in merges
            ],
            f,
        )


def load_bpe_merges(path: str) -> list[tuple[int, str, str, int]]:
    """Load a saved merge list, rank order preserved."""
    import json

    with open(path) as f:
        data = json.load(f)
    out = [(d["rank"], d["lhs"], d["rhs"], d["count"]) for d in data]
    if [r for r, _, _, _ in out] != list(range(1, len(out) + 1)):
        raise ValueError(f"corrupt merge list in {path}: ranks not 1..{len(out)}")
    return out
