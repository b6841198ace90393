"""Table profiling: one-pass per-column data-quality statistics.

The standard first step of any large-corpus pipeline — count, null
count, exact distinct count, min/max — computed for every requested
column in a SINGLE aggregation pass (all measures are partial-aggregable
so the map side combines before one exchange), then unpivoted to a long
(column, stat...) shape. min/max stringified so heterogeneous column
types fit one schema.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """(column, n, n_null, n_distinct, min_s, max_s) per column.

    ``n_distinct`` is exact (count_distinct partials merge in the same
    single-exchange aggregate). At extreme cardinality swap in
    ``approx_count_distinct`` — same plan shape, bounded state.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__n_null"),
            F.count_distinct(col).alias(f"{c}__n_distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__n").alias("n"),
                        F.col(f"{c}__n_null").alias("n_null"),
                        F.col(f"{c}__n_distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_s"),
                        F.col(f"{c}__max").alias("max_s"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")
