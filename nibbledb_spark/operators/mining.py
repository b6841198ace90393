"""Association mining and record linkage.

Two classic data-curation primitives the rest of the dedup/text stack
doesn't cover:

- :func:`basket_pair_lift` — market-basket pair affinity (support +
  lift over co-occurrence baskets): the transactional sibling of
  ``text.collocations_lift`` (same exact-rational lift algebra, but
  counting per-BASKET presence instead of adjacent-token bigrams).
- :func:`fuzzy_match_blocked` — blocked edit-distance record linkage:
  the ER counterpart of the shingle/MinHash near-dup family for SHORT
  keys (names, titles, prefixes) where Levenshtein is the right
  similarity and character-level typos defeat token shingles.

Both follow the repo's engine-exactness rules: counts and distances
stay exact integers; the one double (lift) is a single deterministic
IEEE multiply/divide both engines evaluate identically.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pair_lift(
    transactions: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` item pairs by lift ``N·c(ab) / (c(a)·c(b))`` over
    co-occurrence baskets — the association-rule screen (Agrawal &
    Srikant, VLDB'94 support counting; lift as the interest measure):
    which items appear together far above chance. ``c(x)`` counts
    BASKETS containing x, ``c(ab)`` baskets containing both, ``N``
    total baskets; ``min_count`` is the support floor that kills the
    hapax-pair blowup (the same failure PMI has on rare tokens).

    Returns (item_a, item_b, n_ab, lift) with item_a < item_b, ranked
    by (lift desc, item_a, item_b) — counts exact longs, lift the one
    deterministic IEEE expression (the collocations_lift algebra), so
    selection ties at the k boundary break identically on any engine.

    Shape at scale: ONE basket-keyed aggregate builds each basket's
    sorted item set (``collect_set`` dedups, so no separate distinct
    shuffle), then ONE combined row-local explode emits, per basket,
    every ordered pair ``(x, y), x < y`` PLUS a presence marker
    ``(x, x)`` per item PLUS a single ``(NULL, NULL)`` basket marker —
    so one map-side-combined (a, b) count shuffle produces the pair
    counts, the item supports, AND the basket total N in a single
    pass (``x < y`` is strict and items are non-null, so the three
    row kinds can never collide). Baskets are small, so pairs stream
    out row-locally — never a basket-level self-join of the
    transaction table. The tiny counts frame is the only persisted
    state (distinct-pairs-sized — far under the former basket-sets
    cache, whose arrays it replaces; the former shape also re-exploded
    that cache once per consumer, three full passes where this makes
    one). Scoring then reads only the counts cache: two independent
    small BROADCAST projections for the item supports (the item
    vocabulary is orders of magnitude under the pair set by
    construction; a self-ALIASED broadcast was measured slower —
    dedup-attributes gives each alias a distinct subtree and defeats
    exchange reuse) + a broadcast single-row total +
    TakeOrderedAndProject; no global sort, no vocabulary-keyed shuffle
    joins. For a vocabulary that outgrows the driver (~billions of
    items), drop the hints and let the count joins shuffle — that is
    the seam. One distinct-pairs-sized cache entry stays pinned by the
    returned frame (the pagerank contract).
    """
    sets = (
        transactions.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .groupBy("basket")
        .agg(F.sort_array(F.collect_set("item")).alias("its"))
    )
    # nullif(e, e) manufactures a NULL of the element type (a bare NULL
    # literal would type the marker struct NullType and break concat);
    # try_element_at keeps an all-NULL-items basket (its = []) alive as
    # a basket-total marker, matching the former total = sets.count().
    emit_expr = F.expr(
        "concat("
        "array(struct(nullif(try_element_at(its, 1), try_element_at(its, 1)) AS a,"
        " nullif(try_element_at(its, 1), try_element_at(its, 1)) AS b)),"
        "transform(its, x -> struct(x AS a, x AS b)),"
        "flatten(transform(its, (x, i) -> "
        "transform(slice(its, i + 2, size(its)), y -> struct(x AS a, y AS b))))"
        ")"
    )
    counts = (
        sets.select(F.explode(emit_expr).alias("p"))
        .select(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .persist()
    )
    total = counts.where(F.col("item_a").isNull()).select(
        F.col("n_ab").alias("n")
    )
    ci = counts.where(F.col("item_a") == F.col("item_b")).select(
        F.col("item_a").alias("item"), F.col("n_ab").alias("c")
    )
    pc = counts.where(F.col("item_a") < F.col("item_b")).where(
        F.col("n_ab") >= min_count
    )
    lift = (F.col("n_ab").cast("double") * F.col("n").cast("double")) / (
        F.col("ca").cast("double") * F.col("cb").cast("double")
    )
    return (
        pc.join(
            F.broadcast(ci.select(F.col("item").alias("item_a"), F.col("c").alias("ca"))),
            "item_a",
        )
        .join(
            F.broadcast(ci.select(F.col("item").alias("item_b"), F.col("c").alias("cb"))),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select("item_a", "item_b", "n_ab", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("item_a").asc(), F.col("item_b").asc())
        .limit(k)
    )


def fuzzy_match_blocked(
    records: DataFrame,
    *,
    id_col: str,
    key_col: str,
    block_cols: Sequence[str],
    max_dist: int,
) -> DataFrame:
    """Blocked fuzzy self-match: candidate pairs must share every
    blocking column, then survive ``levenshtein(key) <= max_dist`` —
    standard two-phase entity resolution (blocking bounds the
    candidate space; the edit-distance compare never runs all-pairs).
    Character-level near-duplicate detection for short keys: the
    complement of shingle/MinHash dedup, which token-level hashing
    blinds to single-character typos.

    Returns (id_a, id_b, dist) with id_a < id_b, dist the exact edit
    distance — integer, engine-exact.

    Two filters run BEFORE the quadratic-cost Levenshtein: the
    equi-join on the blocking key (the only shuffle — candidates
    co-locate by block), and the free length bound
    ``|len(a) − len(b)| <= max_dist`` (a true lower bound on edit
    distance, so it never drops a real match). The distance itself
    uses Spark's bounded form (``levenshtein(l, r, threshold)``,
    banded DP that abandons rows over the threshold early).

    Blocking-key choice is the caller's scale lever: cardinality must
    grow with the data (compose columns — first token + length band +
    phonetic key) or the block equi-join inherits the skew of its
    hottest key; recall is bounded by the blocks (a typo INSIDE the
    blocking key separates the pair — run a second pass under a
    different key for the standard multi-pass recall fix).

    Rows with a NULL in ANY blocking column are dropped before the
    join: NULL is "no block", not a block — a null-safe join would
    funnel every unkeyed row into ONE all-pairs block (a skew/
    cross-join hotspot at scale), and plain SQL equality (what an
    oracle writes) never matches NULLs anyway (round-12 advice).
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0: {max_dist}")
    if not block_cols:
        raise ValueError("block_cols must be non-empty: unblocked fuzzy "
                         "matching is an all-pairs cross join")
    r = records.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("_key"),
        *[F.col(c) for c in block_cols],
    )
    for c in block_cols:
        r = r.where(F.col(c).isNotNull())
    left, right = r.alias("l"), r.alias("r")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"l.{c}") == F.col(f"r.{c}") for c in block_cols]
        + [F.col("l._id") < F.col("r._id")],
    )
    return (
        left.join(right, cond)
        .where(
            F.abs(F.length(F.col("l._key")) - F.length(F.col("r._key")))
            <= F.lit(max_dist)
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.levenshtein(F.col("l._key"), F.col("r._key"), max_dist)
            .cast("long")
            .alias("dist"),
        )
        .where(F.col("dist") >= 0)
    )
