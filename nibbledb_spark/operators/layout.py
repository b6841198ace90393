"""Data-layout clustering orders.

At 100 TB the scan-pruning win comes from WRITING data in an order that
makes file min/max statistics selective on the query columns. The
snapshot log already ships Z-ORDER (bit interleave — snapshots.py);
this module adds the Hilbert curve, the strictly-better space-filling
order (every unit step in Hilbert index is a unit step in space, so
value ranges map to fewer, tighter rectangles than Z-order's jumps —
the reason Delta Lake moved its clustering default from Z-order to
Hilbert).

Everything is integer bit arithmetic unrolled per bit — pure JVM-side
column expressions (no UDF, no Python), exact on any engine, so the
index is full-SQL-oracle-able like pagerank's recurrence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hilbert_index(x: Column, y: Column, *, bits: int) -> Column:
    """Hilbert curve index (d) for a point on the ``2^bits × 2^bits``
    grid — the xy2d walk (Hilbert 1891; the standard iterative form):
    per bit from the top, accumulate the quadrant's arc length
    ``s²·((3·rx) XOR ry)`` and rotate/reflect the frame. Unrolled to
    ``bits`` rounds of integer CASE/bitwise expressions, so the whole
    computation is one codegen'd projection — no UDF, no shuffle, and
    bit-identical on any engine.

    Inputs must already be quantized to ``[0, 2^bits)`` longs (clamp or
    bucket upstream — out-of-range bits would silently alias).

    LIMIT: as a single Column the recurrence duplicates the x/y
    subtrees ~3x per bit, so the expression tree grows ~3^bits and
    Catalyst analysis time with it — capped at 6 bits (a 64x64 grid,
    plenty for layout bucketing). For finer grids use
    :func:`append_hilbert_index`, the chained-projection form whose
    plan grows LINEARLY in bits (per-round aliases are referenced more
    than once, so CollapseProject keeps them materialized instead of
    re-inlining the blowup).
    """
    if not 1 <= bits <= 6:
        raise ValueError(f"bits must be in [1, 6]: {bits}")
    xx, yy = x.cast("long"), y.cast("long")
    d = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.when((xx.bitwiseAND(F.lit(s))) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when((yy.bitwiseAND(F.lit(s))) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d = d + F.lit(s).cast("long") * F.lit(s).cast("long") * (
            (F.lit(3).cast("long") * rx).bitwiseXOR(ry)
        )
        # rotate the quadrant: ry==0 -> (reflect if rx==1, then swap x/y)
        nx = F.when(ry == 0, F.when(rx == 1, F.lit(s - 1).cast("long") - yy).otherwise(yy)).otherwise(xx)
        ny = F.when(ry == 0, F.when(rx == 1, F.lit(s - 1).cast("long") - xx).otherwise(xx)).otherwise(yy)
        xx, yy = nx, ny
    return d


def append_hilbert_index(
    df,
    x_col: str,
    y_col: str,
    *,
    bits: int,
    out_col: str = "__hilbert",
):
    """:func:`hilbert_index` as one chained projection per bit: each
    round SELECTs the rotated (x, y) and accumulated d as NAMED columns
    the next round references — plan size linear in ``bits`` (the
    Column form is ~3^bits; see its LIMIT note), still pure codegen'd
    integer expressions, no UDF, no shuffle. Returns ``df`` plus
    ``out_col``; the scratch columns are dropped."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    xx, yy, dd = "__hx", "__hy", out_col
    cur = df.select(
        "*",
        F.col(x_col).cast("long").alias(xx),
        F.col(y_col).cast("long").alias(yy),
        F.lit(0).cast("long").alias(dd),
    )
    others = [c for c in df.columns]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.when((F.col(xx).bitwiseAND(F.lit(s))) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        ry = F.when((F.col(yy).bitwiseAND(F.lit(s))) > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        nd = F.col(dd) + F.lit(s).cast("long") * F.lit(s).cast("long") * (
            (F.lit(3).cast("long") * rx).bitwiseXOR(ry)
        )
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1).cast("long") - F.col(yy)).otherwise(
                F.col(yy)
            ),
        ).otherwise(F.col(xx))
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1).cast("long") - F.col(xx)).otherwise(
                F.col(xx)
            ),
        ).otherwise(F.col(yy))
        cur = cur.select(
            *others, nx.alias(xx), ny.alias(yy), nd.alias(dd)
        )
    return cur.select(*others, F.col(dd))


def hilbert_sql(x_expr: str, y_expr: str, *, bits: int) -> str:
    """The DuckDB mirror of :func:`hilbert_index` as an unrolled CTE
    chain: ``r0`` quantizes, each ``r{i}`` applies one bit round of the
    identical integer recurrence — the pagerank unrolled-oracle pattern
    applied to a per-row bit walk. Returns the CTE list body; the
    caller selects ``d`` from ``r{bits}``."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    ctes = [
        f"r0 AS (SELECT *, CAST({x_expr} AS BIGINT) AS hx0, "
        f"CAST({y_expr} AS BIGINT) AS hy0, CAST(0 AS BIGINT) AS hd0 FROM src)"
    ]
    for k, i in enumerate(range(bits - 1, -1, -1)):
        s = 1 << i
        p, n = k, k + 1
        ctes.append(
            f"""r{n} AS (
  SELECT * EXCLUDE (hx{p}, hy{p}, hd{p}),
         CASE WHEN (hy{p} & {s}) > 0 THEN hx{p}
              WHEN (hx{p} & {s}) > 0 THEN {s - 1} - hy{p}
              ELSE hy{p} END AS hx{n},
         CASE WHEN (hy{p} & {s}) > 0 THEN hy{p}
              WHEN (hx{p} & {s}) > 0 THEN {s - 1} - hx{p}
              ELSE hx{p} END AS hy{n},
         hd{p} + CAST({s} AS BIGINT) * {s} * xor(
             3 * (CASE WHEN (hx{p} & {s}) > 0 THEN 1 ELSE 0 END),
             CASE WHEN (hy{p} & {s}) > 0 THEN 1 ELSE 0 END
         ) AS hd{n}
  FROM r{p})"""
        )
    return ",\n".join(ctes)
