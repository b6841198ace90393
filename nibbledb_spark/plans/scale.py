"""Scale toolkit: the plan-shaping moves a 100 TB deployment leans on.

- **Bucketing** (`bucket_table`): persist a table hash-bucketed and
  sorted by its join key. Two tables bucketed the same way co-locate:
  Spark joins them bucket-to-bucket with NO exchange on either side —
  the shuffle that dominates repeated fact-fact joins disappears from
  every downstream query. This is the materialized analogue of the
  engine's bucket-partitioned point store (engine.py).
- **Salting** (`salted_join`): for the skewed-key join AQE can't fully
  save (one key holding a double-digit percentage of rows), split each
  hot left row into one of S salt lanes and replicate the right side S
  ways. Turns one straggler task into S even ones at the cost of an
  S-times-larger build side — the standard trade when the build side is
  small and the probe side is skewed.
- **Inspection** (`plan_string`, `exchange_count`): assertions for
  tests/ops — shuffles are a budget, so count them.
"""

from __future__ import annotations

import contextlib
import io
import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain`` prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators this query EXECUTES.

    Counts the formatted plan's tree, excluding any ``InMemoryRelation``
    subtree: a cached relation's build plan (which may legitimately
    contain the one clustering shuffle paid at cache build — see
    ``points_from_events``) executes once per cache lifetime, not per
    query, so it is not part of a query's shuffle budget. The exclusion
    also dodges AQE's double-print of build plans (``== Initial Plan ==``
    + ``== Final Plan ==`` under a materialized cache would otherwise
    count every build shuffle twice). ``ReusedExchange`` never matches
    (no word boundary), matching the budget's intent: a reused exchange
    moves no new rows."""
    tree = plan_string(df).split("\n\n", 1)[0]
    ids: set[str] = set()
    skip_indent: int | None = None
    # Depth = column of the node marker ('+-'/':-'), NOT leading spaces:
    # children of a ':-' left branch are prefixed ':  ' (same number of
    # leading SPACES as their parent), so a whitespace-only indent reset
    # skip mid-subtree and counted the cached build plan's exchanges
    # (round-6 ADVICE). '[\s:]*' captures the full fill prefix.
    marker = re.compile(r"^([\s:]*)[+:]-")
    for line in tree.splitlines():
        m = marker.match(line)
        if m is not None:
            indent = len(m.group(1))
        else:
            # root line or continuation text: spaces+colon fill is depth
            indent = len(line) - len(line.lstrip(" :"))
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
            continue
        # Distinct node ids: a shared subtree prints under every parent
        # that references it, but the runtime builds the exchange once.
        # Shuffle exchanges only — Broadcast/ReusedExchange move the
        # small side / nothing, and never matched the budgets' intent.
        ids.update(re.findall(r"(?<![A-Za-z])Exchange \((\d+)\)", line))
    return len(ids)


def bucket_table(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    num_buckets: int = 64,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed (and sorted) by
    ``keys``. Joins/aggregations between tables bucketed identically on
    the join key run with zero exchanges (and, when sorted, zero sorts)
    — pay the shuffle once at write, never again at read."""
    keys = list(keys)
    writer = df.write.mode(mode).bucketBy(num_buckets, keys[0], *keys[1:])
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.format("parquet").saveAsTable(name)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skew.

    Left rows are spread across ``salt`` lanes by a deterministic hash
    of the full row (so the hot key's rows land in different tasks);
    the right side is replicated once per lane. Correct for any join
    type whose semantics survive right-side replication partitioned by
    lane (inner/left); result equals ``left.join(right, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    on = list(on)
    lane = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_s = left.withColumn("__lane", lane.cast("int"))
    r_s = right.withColumn(
        "__lane", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_s.join(r_s, on + ["__lane"], how)
    return out.drop("__lane")


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton (Z-order) key: interleaves the low ``bits`` bits of each
    integer column, so sorting by the key clusters rows that are close
    in EVERY dimension — the multi-column data-skipping layout. A table
    linearly sorted on (x, y) prunes files only on x (each file spans
    the full y range); written in Z-order, per-file min/max stats prune
    on x OR y alone (each file covers a hyper-rectangle).

    Pure codegen (shifts and masks, no UDF). Columns must already be
    non-negative integers in [0, 2^bits) — rank/bucket continuous values
    first (e.g. ``F.percent_rank`` scaled, or epoch-day). Cost of the
    layout is one range-repartition + in-partition sort at WRITE time;
    reads pay nothing. Use with SnapshotLog(stats_cols=(x, y)) or any
    format with file-level min/max skipping.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * len(cs) + j))
    return key
