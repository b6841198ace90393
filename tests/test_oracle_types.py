"""Structural guard against driver-canonicalization failures.

The driver compares Spark results and DuckDB oracle results through
pandas (``.df()`` / ``toPandas()``), which silently changes some dtypes:

- DuckDB HUGEINT (the type of a bare integer ``SUM``/windowed ``SUM``)
  becomes float64, rendering ``3010.0`` against Spark's ``3010`` — a
  hash mismatch on bit-identical values. This shipped TWICE (rounds 1
  and 3) before this guard existed.
- LIST/STRUCT columns become numpy ndarrays, which pandas
  ``sort_values`` cannot factorize — the driver crashes outright
  (round-3 ``minhash_signatures``).

These tests DESCRIBE every declared oracle in DuckDB (no execution) and
analyze every declared Spark query's schema (no execution) and fail on
any output column whose type would be mangled by that channel. Fix the
query, not the test: CAST integer aggregates to BIGINT; emit arrays as
``concat_ws`` strings on both engines.
"""

from __future__ import annotations

import re

import duckdb
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_ORACLE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB types pandas renders lossily (numeric widening) or unsortably
# (nested). UUID/BLOB/INTERVAL never appear but would be just as hostile.
_HOSTILE_DUCK = re.compile(
    r"HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT|DECIMAL|"
    r"STRUCT|MAP|UNION|INTERVAL|\[\]"
)


def _oracle_names():
    return sorted(entry.oracle_sql())


def _query_names():
    return sorted(entry.queries())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_output_types_survive_pandas(duck, name):
    sql = entry.oracle_sql()[name]
    desc = duck.execute(f"DESCRIBE SELECT * FROM ({sql}) q").fetchall()
    hostile = [
        f"{col}: {typ}" for col, typ, *_ in desc if _HOSTILE_DUCK.search(typ)
    ]
    assert not hostile, (
        f"oracle '{name}' outputs DuckDB types the driver's pandas "
        f"canonicalizer mangles ({hostile}); CAST to BIGINT/DOUBLE/VARCHAR "
        f"or stringify nested values on both engines"
    )


def test_spark_query_output_types_survive_pandas(spark):
    """One pass (not parametrized) over every declared query's output
    schema. Reading ``.schema`` itself is analysis-only, but BUILDING a
    few DataFrames does real work (timetravel_versions replays a
    snapshot store; ivf_ann_topk_kmeans runs Lloyd iterations with
    collects), so this costs tens of seconds — still cheapest as a
    single test sharing one session rather than 114 parametrized
    builds."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    hostile = []
    for name, fn in entry.queries().items():
        schema = fn(spark, SF_ORACLE).schema  # analysis only, no execution
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                hostile.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not hostile, (
        f"Spark queries output nested columns the driver's pandas sort "
        f"crashes on ({hostile}); emit concat_ws/to_json scalars instead"
    )
