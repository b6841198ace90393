"""Readers for the driver's testdata star schema (TESTDATA.md) and the
events->points mapping that drives the time-series surface at scale.

``events`` doubles as the nibbledb-shaped stream (FIXTURES.md §B):
series = event_type, ts = epoch µs, tag = parsed props JSON, value.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table: {name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def points_from_events(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """events.parquet -> canonical points schema.

    ts is cast to epoch µs on read. events.ts is TIMESTAMP(NANOS) in the
    file; with ``spark.sql.legacy.parquet.nanosAsLong`` Spark reads it as
    int64 ns and we floor-divide to µs — the same truncation DuckDB's
    µs-precision TIMESTAMP applies at scan (FIXTURES.md timestamp caution).
    """
    ev = load_table(spark, "events", sf_dir)
    ts_type = dict(ev.dtypes)["ts"]
    # integer div: ns epoch > 2^53 would lose precision through a double
    ts_us = (
        F.expr("CAST(ts div 1000 AS BIGINT)")
        if ts_type == "bigint"
        else F.unix_micros(F.col("ts"))
    )
    return ev.select(
        F.col("event_type").alias("series"),
        ts_us.alias("ts"),
        F.from_json(F.col("props"), "map<string,string>").alias("tag"),
        F.col("value").alias("value"),
    )
