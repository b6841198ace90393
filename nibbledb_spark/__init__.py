"""nibbledb_spark — a PySpark-native time-series analytics engine.

A brand-new engine with the query and data-processing capabilities of
jptmoore/nibbledb (reference surveyed in SURVEY.md), re-expressed as
idiomatic Spark DataFrame / SQL / Structured Streaming plans, plus the
relational and LLM-data-pipeline operators a 100 TB training-data
pipeline needs.

Layering:

- ``schema``    — canonical point schema + ingest validation
- ``session``   — SparkSession construction tuned for the target
- ``engine``    — TimeSeriesEngine: series-partitioned parquet store
- ``operators`` — pure DataFrame->DataFrame query builders
- ``sources``   — table readers for the testdata star schema
- ``streaming`` — Structured Streaming ingest path
- ``plans``     — canonical ordering / serialization for parity tests
- ``snapshots`` — manifest-log table format: versioned parquet with
  time travel, atomic commits, file-stats pruning (the Irmin/Git
  history analogue)
"""

from nibbledb_spark.schema import POINT_SCHEMA, validate_point
from nibbledb_spark.session import get_spark
from nibbledb_spark.snapshots import SnapshotLog

__all__ = ["POINT_SCHEMA", "validate_point", "get_spark", "SnapshotLog"]

__version__ = "0.1.0"
