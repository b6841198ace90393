"""Source/sink coverage (SURVEY.md §2 Part B rows 1-2): the canonical
points table round-trips bit-exactly through every supported format,
including the CSV tag-map JSON encoding, and the streaming file source
converges to the batch read of the same directory."""

from __future__ import annotations

import pytest

from nibbledb_spark.sources.registry import (
    FORMATS,
    read_points,
    stream_points,
    write_points,
)


def _canon(df):
    return sorted(
        (r["series"], r["ts"], tuple(sorted((r["tag"] or {}).items())), r["value"])
        for r in df.collect()
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_points_round_trip(spark, fixture_points, tmp_path, fmt):
    path = str(tmp_path / f"pts_{fmt}")
    write_points(fixture_points, path, fmt)
    back = read_points(spark, path, fmt)
    assert back.schema.simpleString() == fixture_points.schema.simpleString()
    assert _canon(back) == _canon(fixture_points)


def test_streaming_file_source_converges(spark, fixture_points, tmp_path):
    """STREAM parity: reading a finite directory through the streaming
    source (availableNow) must equal the batch read."""
    src = str(tmp_path / "drop")
    write_points(fixture_points, src, "json")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream_points(spark, src, "json")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _canon(spark.read.parquet(out)) == _canon(fixture_points)


def test_table_and_points_caches_invalidate_on_rewrite(spark, tmp_path):
    """The analyzed-relation cache AND the persisted points view both
    re-resolve when the backing parquet file changes — a rewritten
    table must not serve a stale (or deleted) file list."""
    import shutil

    from nibbledb_spark.sources import registry

    sf = tmp_path / "sfX"
    sf.mkdir()
    src = "/root/testdata/sf0.001"
    for t in registry.TABLES:
        shutil.copy(f"{src}/{t}.parquet", sf / f"{t}.parquet")
    pts1 = registry.points_from_events(spark, str(sf))
    n1 = pts1.count()
    ev1 = registry.load_table(spark, "events", str(sf))
    assert registry.load_table(spark, "events", str(sf)) is ev1  # cache hit
    # rewrite events with a strict subset of rows (copy from a file with
    # different content: truncate via duckdb rewrite)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/events.parquet') LIMIT 10) "
        f"TO '{sf}/events.parquet' (FORMAT PARQUET)"
    )
    ev2 = registry.load_table(spark, "events", str(sf))
    assert ev2 is not ev1  # stamp changed -> re-analyzed
    pts2 = registry.points_from_events(spark, str(sf))
    n2 = pts2.count()
    assert n2 == 10 and n1 != n2  # fresh data, not the stale persist
