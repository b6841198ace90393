"""Declared query registry: every operator surfaced to the driver.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL string for the DuckDB oracle. Column names
are aliased identically on both sides (the driver sorts columns by name
before hashing). Registered via the ``@declared`` decorator; consumed by
``__spark_entry__``.

Float-parity policy (SURVEY.md §2 parity classes):
- EXACT queries emit only ints/strings/exactly-representable doubles.
- FLOAT aggregate sums go through DECIMAL so both engines compute the
  identical exact value regardless of summation order:
  ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``.
- Order-insensitive: the driver hash ignores row order, so ORDER BY is
  cosmetic; ties only matter where they change row *selection*
  (top-n / limit), and every such query carries a unique-key tiebreak.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nibbledb_spark.operators import timeseries as ts_ops
from nibbledb_spark.sources.registry import points_from_events

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def declared(name: str, sql: str | None = None):
    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return wrap


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Part A — the reference's time-series surface, on events-as-points
# (series = event_type, ts = epoch µs, tag = parsed props, value)
# ---------------------------------------------------------------------------

# DuckDB-side points view; tag lookup inlined as json_extract_string.
_POINTS_CTE = """
WITH points AS (
  SELECT event_type AS series,
         epoch_us(ts) AS ts,
         json_extract_string(props, '$.k') AS tag_k,
         value
  FROM events
)
"""

# epoch µs bounds used by the scan queries (events span 2024-01)
_SINCE = 1_705_708_800_000_000  # 2024-01-20
_FROM = 1_704_844_800_000_000  # 2024-01-10
_TO = 1_705_276_800_000_000  # 2024-01-15


@declared(
    "ts_last_n",
    _POINTS_CTE
    + """
SELECT series, ts, value FROM (
  SELECT series, ts, value,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY ts DESC, value DESC) AS rn
  FROM points
) WHERE rn <= 3
""",
)
def ts_last_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: newest n per series (per-series limit, quirk Q4)."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.last_n(pts, (), 3).select("series", "ts", "value")


@declared(
    "ts_first_n",
    _POINTS_CTE
    + """
SELECT series, ts, value FROM (
  SELECT series, ts, value,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY ts ASC, value ASC) AS rn
  FROM points
) WHERE rn <= 2
""",
)
def ts_first_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: oldest n per series."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.first_n(pts, (), 2).select("series", "ts", "value")


@declared(
    "ts_latest",
    _POINTS_CTE
    + """
SELECT series, ts, value FROM (
  SELECT series, ts, value,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY ts DESC, value DESC) AS rn
  FROM points
) WHERE rn = 1
""",
)
def ts_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: latest point per series."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.latest(pts, ()).select("series", "ts", "value")


@declared(
    "ts_since",
    _POINTS_CTE + f"SELECT series, ts, value FROM points WHERE ts >= {_SINCE}",
)
def ts_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: ts >= from, inclusive."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.since(pts, (), _SINCE).select("series", "ts", "value")


@declared(
    "ts_range",
    _POINTS_CTE
    + f"SELECT series, ts, value FROM points WHERE ts BETWEEN {_FROM} AND {_TO}",
)
def ts_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: both bounds inclusive."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.time_range(pts, (), _FROM, _TO).select("series", "ts", "value")


@declared(
    "ts_tag_equals",
    _POINTS_CTE + "SELECT series, ts, value FROM points WHERE tag_k = '42'",
)
def ts_tag_equals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: tag equality; missing tag drops the point."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.tag_filter(pts, ["k"], ["42"]).select("series", "ts", "value")


@declared(
    "ts_tag_contains",
    _POINTS_CTE + "SELECT series, ts, value FROM points WHERE tag_k LIKE '%9%'",
)
def ts_tag_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: literal substring match on the tag value."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.tag_filter(pts, ["k"], ["9"], mode="contains").select(
        "series", "ts", "value"
    )


@declared(
    "ts_tag_compound_or",
    _POINTS_CTE + "SELECT series, ts, value FROM points WHERE tag_k IN ('42', '69')",
)
def ts_tag_compound_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: repeated tag name => OR of values."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.tag_filter(pts, ["k", "k"], ["42", "69"]).select(
        "series", "ts", "value"
    )


@declared(
    "ts_agg_exact",
    _POINTS_CTE
    + """
SELECT series,
       CAST(COUNT(value) AS DOUBLE) AS count,
       MAX(value) AS max,
       MIN(value) AS min
FROM points GROUP BY series
""",
)
def ts_agg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17-A19 per series (count as float — quirk Q8)."""
    pts = points_from_events(spark, sf_dir)
    return pts.groupBy("series").agg(
        F.count("value").cast("double").alias("count"),
        F.max("value").alias("max"),
        F.min("value").alias("min"),
    )


@declared(
    "ts_agg_float",
    _POINTS_CTE
    + """
SELECT series,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value) AS mean,
       ROUND(STDDEV_POP(value), 6) AS sd,
       QUANTILE_CONT(value, 0.5) AS median
FROM points GROUP BY series
""",
)
def ts_agg_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16/A20/A21/A22 per series; sums via DECIMAL for order-independent
    exactness, sd rounded, median exact."""
    pts = points_from_events(spark, sf_dir)
    dec_sum = F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
    return pts.groupBy("series").agg(
        dec_sum.alias("sum"),
        (dec_sum / F.count("value")).alias("mean"),
        F.round(F.stddev_pop("value"), 6).alias("sd"),
        F.expr("percentile(value, 0.5)").alias("median"),
    )


@declared(
    "ts_filtered_agg",
    _POINTS_CTE
    + """
SELECT CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum
FROM points WHERE tag_k = '42'
""",
)
def ts_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A23 documented semantics: tag equality then aggregate."""
    pts = points_from_events(spark, sf_dir)
    sel = ts_ops.tag_filter(pts, ["k"], ["42"])
    return sel.agg(
        F.coalesce(
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double"), F.lit(0.0)
        ).alias("sum")
    )


@declared(
    "ts_length",
    _POINTS_CTE
    + "SELECT COUNT(*) AS length FROM points WHERE series IN ('click', 'view')",
)
def ts_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A27: total point count over listed series."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.length(pts, ["click", "view"])


@declared("ts_names", _POINTS_CTE + "SELECT DISTINCT series FROM points")
def ts_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A30: distinct series names."""
    pts = points_from_events(spark, sf_dir)
    return ts_ops.series_names(pts)


# ---------------------------------------------------------------------------
# Part B — relational surface (first batch)
# ---------------------------------------------------------------------------


@declared(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary. One scan, map-side
    partial hash aggregation, no shuffle beyond the 6-group exchange."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(25,6)")  # noqa: E731
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(dec(disc_price)).cast("double").alias("sum_disc_price"),
            F.sum(dec(charge)).cast("double").alias("sum_charge"),
            (F.sum(dec(F.col("l_quantity"))).cast("double") / n).alias("avg_qty"),
            (F.sum(dec(F.col("l_extendedprice"))).cast("double") / n).alias("avg_price"),
            (F.sum(dec(F.col("l_discount"))).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@declared(
    "join_orders_customer",
    """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join: customer is the small build side."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@declared(
    "join_anti_customers_without_orders",
    """
SELECT COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count("*").alias("n_customers"))
    )


@declared(
    "top10_orders",
    """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k => TakeOrderedAndProject, never a full sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@declared(
    "window_top3_per_customer",
    """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_top3_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per customer."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@declared(
    "window_order_gap_days",
    """
SELECT o_custkey, o_orderkey,
       DATE_DIFF('day',
                 LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS gap_days
FROM orders
""",
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: days since the customer's previous order."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    )


@declared(
    "date_trunc_monthly_orders",
    """
SELECT STRFTIME(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM orders GROUP BY 1
""",
)
def date_trunc_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions: month bucketing (emitted as a string — engine-
    neutral rendering)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@declared(
    "distinct_mktsegments",
    "SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (shuffle dedup)."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()
