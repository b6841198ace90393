"""Count-Min sketch: approximate frequency counting in sublinear space
(Cormode & Muthukrishnan 2005 — the standard streaming-sketch family
member next to HLL for distinct counting).

Why it matters at 100 TB: exact per-key counts of a high-cardinality
column (tokens, URLs, user ids) shuffle one row per distinct key; the
sketch shuffles d x w COUNTERS (kilobytes, fixed a priori) no matter
how many keys exist, and sketches of partitions/days merge by cell-wise
addition. Guarantee: estimate >= true count always (one-sided), and
estimate <= true + e*N/w with probability >= 1 - (1/2)^d over the d
independent hash rows.

All hashing is md5-prefix based (the repo-wide portable hash), so
sketches are deterministic across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 256


def _bucket(key, row: int, width: int):
    """Row-seeded md5-prefix bucket in [0, width)."""
    seeded = F.concat(F.lit(f"{row}:"), key.cast("string"))
    h = F.conv(F.substring(F.md5(seeded.cast("binary")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) with depth x width cells.

    One pass: each input row lands in ``depth`` cells (a small constant
    fan-out, map-side combined), and the aggregate output is the fixed
    d x w table regardless of key cardinality — the whole point. Cellwise
    addition merges sketches built over different partitions of the data
    (pinned in tests).
    """
    key = F.col(key_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _bucket(key, r, width).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Estimated count per key: min over the key's ``depth`` cells.

    The sketch is tiny (d x w rows) and is BROADCAST; the probe is a
    map-side join however many keys are probed.
    """
    key = F.col(key_col)
    probes = keys.select(
        key.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _bucket(key, r, width).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select("key", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
        .withColumnRenamed("key", key_col)
    )
