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
