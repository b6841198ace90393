"""Table readers / sinks for the engine and the declared query set."""

from nibbledb_spark.sources.registry import TABLES, load_table, points_from_events
from nibbledb_spark.sources.wire import NibbleWireDataSource, register_wire_source

__all__ = [
    "TABLES",
    "NibbleWireDataSource",
    "load_table",
    "points_from_events",
    "register_wire_source",
]
