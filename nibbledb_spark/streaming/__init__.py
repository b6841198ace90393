"""Structured Streaming ingest path (SURVEY.md §2 A1-A5)."""

from nibbledb_spark.streaming.ingest import StreamingIngest, windowed_counts

__all__ = ["StreamingIngest", "windowed_counts"]
