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


def test_registry_names_bind_their_own_builders():
    """Round-10 incident class: stacking two ``@declared`` decorators on
    one def registers BOTH names to that def and orphans the def the
    second decorator was written for (``fingerprint_winnowing`` served
    ``winnow_near_dup_pairs``'s plan for a full driver round). The
    decorator now raises at import on a ``__name__`` mismatch; this pin
    fails if that guard is ever weakened, and additionally asserts no
    function object answers to two names."""
    from nibbledb_spark.queries import PYTEST_ONLY_QUERIES, QUERIES

    every = {**QUERIES, **PYTEST_ONLY_QUERIES}
    mismatched = [n for n, fn in every.items() if fn.__name__ != n]
    assert not mismatched, f"registry name != builder __name__: {mismatched}"

    by_id: dict[int, list[str]] = {}
    for n, fn in every.items():
        by_id.setdefault(id(fn), []).append(n)
    shared = [names for names in by_id.values() if len(names) > 1]
    assert not shared, f"one builder registered under several names: {shared}"


def test_no_orphaned_query_builders():
    """The other half of the stacking failure mode: a def written to be
    a registry entry that no decorator actually registered. Any
    module-level function in queries.py with the ``(spark, sf_dir)``
    builder signature must appear in QUERIES or PYTEST_ONLY_QUERIES."""
    import inspect

    import nibbledb_spark.queries as q

    registered = set(q.QUERIES) | set(q.PYTEST_ONLY_QUERIES)
    orphans = []
    for name, fn in vars(q).items():
        if not inspect.isfunction(fn) or fn.__module__ != q.__name__:
            continue
        if name.startswith("_"):  # private helpers share the signature
            continue
        try:
            params = list(inspect.signature(fn).parameters)
        except (TypeError, ValueError):
            continue
        if params[:2] == ["spark", "sf_dir"] and name not in registered:
            orphans.append(name)
    assert not orphans, (
        f"builder-shaped defs never registered (misplaced/missing "
        f"@declared): {orphans}"
    )
