"""Sequence packing: lay documents end-to-end into fixed token-budget
training sequences (SURVEY.md §2 Part C extensions).

LLM pre-training consumes fixed-length sequences; the standard prep step
concatenates tokenized documents in a deterministic order and slices the
stream at budget boundaries. This operator computes, per document, where
its tokens land in that stream: the running offset, the pack (sequence)
id where it starts, and whether it straddles a pack boundary — all from
ONE exclusive-prefix-sum window, no iteration, no state.

Scale note: a single global ordering would funnel the prefix sum through
one partition, so packing is computed *per group* (default: per
``source``) — each group is an independent token stream, which is also
what mixing pipelines want (streams are interleaved at the batch level
downstream). The window shuffles once on the group key; groups pack in
parallel.

The reference (jptmoore/nibbledb) has no such surface; north-star
extension scope.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nibbledb_spark.operators.text import tokens


def pack_sequences(
    docs: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-document packing coordinates for a token budget.

    Returns one row per document:
    - ``n_tokens``: whitespace token count;
    - ``start_offset``: tokens preceding this document in its group's
      stream (exclusive prefix sum in ``id_col`` order);
    - ``pack_id``: index of the budget-sized sequence where the document
      starts (``start_offset div budget``);
    - ``straddles``: true when the document crosses a pack boundary
      (its span would be split across training sequences).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    n = F.size(tokens(text_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select(
            F.col(id_col),
            F.col(group_col),
            n.alias("n_tokens"),
        )
        .withColumn("start_offset", start)
        .withColumn("pack_id", F.expr(f"start_offset div {budget}"))
        .withColumn(
            "straddles",
            F.expr(f"(start_offset + n_tokens - 1) div {budget}") != F.col("pack_id"),
        )
    )


_FFD_SCHEMA = (
    "doc_id long, group string, n_tokens int, bin_id int, bin_offset int, "
    "oversize boolean"
)


def pack_bins_ffd(
    docs: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n_subgroups: int = 1,
) -> DataFrame:
    """First-fit-decreasing bin packing WITHOUT document splitting —
    the other half of the packing story. :func:`pack_sequences` is
    concat-and-chop (documents straddle sequence boundaries; maximal
    density, attention bleed across documents); this packs each
    document WHOLE into budget-sized bins (no straddling — the prep
    for models trained without cross-document attention), trading a
    bounded amount of padding waste for clean boundaries.

    Per group, documents sort by (n_tokens desc, id) and each goes to
    the first open bin it fits in — the classic FFD heuristic
    (Johnson 1973: never worse than 11/9 OPT + 6/9 bins; first-fit
    also guarantees AT MOST ONE bin at or below half fill, the
    invariant the declared ``pack_ffd_bound`` query checks driver-
    visibly). Documents longer than ``budget`` cannot pack; each gets
    a dedicated bin flagged ``oversize`` (route those through
    chunk_documents first).

    Returns one row per document: (id, group, n_tokens, bin_id,
    bin_offset, oversize) — bin_id dense per group in bin-creation
    order, bin_offset the token offset inside the bin in placement
    order.

    Shape at scale: packing is inherently SEQUENTIAL within a stream,
    so this is the documented ``applyInPandas`` seam (Arrow-batched,
    one shuffle on the group key) rather than a window trick. Groups
    pack in parallel; a group too large for one task is subdivided
    with ``n_subgroups`` (hash-salted subgroup key appended to
    ``group``) — each subgroup packs independently, adding at most
    one under-half-full bin per subgroup while bounding every task to
    its subgroup. The FFD inner loop is the textbook linear-scan
    first-fit — O(docs x open-bins) per subgroup worst case (a
    capacity-indexed tree would make it O(n log n); at that point
    raise n_subgroups instead, which also caps the quadratic term) —
    over plain int lists per task, nothing per-row in Python at the
    Spark layer.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    if n_subgroups < 1:
        raise ValueError(f"n_subgroups must be >= 1: {n_subgroups}")

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (
            F.col(group_col)
            if n_subgroups == 1
            else F.concat_ws(
                "#",
                F.col(group_col),
                (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_subgroups))).cast(
                    "string"
                ),
            )
        ).alias("group"),
        F.size(tokens(text_col)).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        bins_free: list[int] = []  # remaining capacity per bin
        bins_fill: list[int] = []  # tokens placed per bin (offset source)
        bin_ids, offsets, oversize = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget:
                bin_ids.append(len(bins_free))
                offsets.append(0)
                oversize.append(True)
                # -1, not 0: even a degenerate zero-token doc (n == 0
                # passes any free >= n test) must never share an
                # oversize bin
                bins_free.append(-1)
                bins_fill.append(n)
                continue
            for b, free in enumerate(bins_free):
                if free >= n:
                    break
            else:
                b = len(bins_free)
                bins_free.append(budget)
                bins_fill.append(0)
            bin_ids.append(b)
            offsets.append(bins_fill[b])
            bins_free[b] -= n
            bins_fill[b] += n
            oversize.append(False)
        out = pdf.copy()
        out["bin_id"] = bin_ids
        out["bin_offset"] = offsets
        out["oversize"] = oversize
        return out

    return base.groupBy("group").applyInPandas(pack, _FFD_SCHEMA)
