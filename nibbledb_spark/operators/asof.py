"""As-of and banded range joins — operators Spark lacks natively,
composed from built-in DataFrame ops (SURVEY.md §2 Part B).

The as-of join uses the union + last(ignoreNulls) window trick instead
of a per-key merge join: one shuffle on the key, no Python in the path,
and — unlike a naive non-equi join — no quadratic blow-up when a key
has many right-side rows. This is the formulation that survives 100 TB:
the window is a single pass over (key, ts)-sorted data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` per key (backward as-of, inclusive).

    Implementation: tag both sides, union on (key, ts), then
    ``last(value, ignoreNulls)`` over a window ordered by
    (ts, side-marker) with an unbounded-preceding frame. Right rows
    sort before left rows at equal ts, so an equal-timestamp right row
    IS visible to the left row (<=, matching e.g. DuckDB ASOF JOIN).
    """
    on = list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    out_cols = [f"{c}{suffix}" for c in value_cols]

    left_cols = [c for c in left.columns]
    l_side = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(value_cols, out_cols)],
    )
    r_side = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)],
    ).select(*l_side.columns)  # align column order for the union

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = r_side.unionByName(l_side).select(
        *[c for c in l_side.columns if c not in out_cols],
        *[F.last(o, ignorenulls=True).over(w).alias(o) for o in out_cols],
    )
    return filled.where(F.col("__side") == 1).drop("__t", "__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    condition: Column,
) -> DataFrame:
    """Banded/interval join: equi keys + a range predicate. Catalyst
    executes the equi part as a hash/sort-merge join and applies the
    band as a post-join filter — linear in matches, not |L|x|R|."""
    return left.join(right, [*(left[c] == right[c] for c in on)], "inner").where(
        condition
    )
