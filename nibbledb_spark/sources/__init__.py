"""Table readers / sinks for the engine and the declared query set."""

from nibbledb_spark.sources.registry import TABLES, load_table, points_from_events

__all__ = ["TABLES", "load_table", "points_from_events"]
