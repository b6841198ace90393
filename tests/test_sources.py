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
