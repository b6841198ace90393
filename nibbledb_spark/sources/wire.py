"""``nibble_wire``: a Spark 4 Python DataSource for the reference's JSON
wire format.

The reference ingests points as JSON arrays over HTTP
(``src/main.re:60-67``: ``[{"timestamp":..., "tag":[{"k":"v"}], "value":
...}, ...]``, one series per request path). Its on-disk test fixtures
(``test/butterflies.json`` / ``test/honeybees.json``) are exactly those
request bodies. This connector reads such files straight into the
canonical points table::

    spark.dataSource.register(NibbleWireDataSource)
    pts = (spark.read.format("nibble_wire")
                .option("mode", "strict")       # quirk-Q3 field-order check
                .option("default_ts", 0)        # for records missing a ts
                .load("/data/wire/*.json"))
    # -> points(series STRING, ts BIGINT µs, tag MAP<STRING,STRING>, value DOUBLE)

Why a custom DataSource rather than ``spark.read.json``: the wire format
is *not* relationally well-formed — field-order-sensitive validation
(quirk Q3), assoc-list tags (``[{"k":"v"}, ...]``, duplicate keys
last-wins), bool-vs-numeric value rejection, and the series name living
OUTSIDE the payload (URL path; here the file basename). ``from_json``
cannot express any of that; this is precisely the seam Spark's Python
DataSource API (SPARK-44076) exists for.

Scale shape: one :class:`InputPartition` per file, so a directory of
request logs parses fully in parallel and feeds downstream codegen
stages through Arrow batching; per-record Python cost is inherent to the
wire format (the reference parses the same JSON single-threaded per
HTTP request — ``bench.py --ingest`` measures our replay throughput
against that ceiling). Validation failures raise (executor task error ->
job error): the reference 400s the whole batch on one bad record, and a
silent drop would corrupt ingest accounting.

Batch source only: continuous tailing of wire files goes through the
existing Structured Streaming ingest (``streaming/ingest.py``), which
watches a directory with the same validation semantics.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from nibbledb_spark.schema import POINT_SCHEMA, ValidationError, validate_point


class _WireFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _expand(path_opt: str) -> list[str]:
    """Comma-separated paths; each a file, a glob, or a directory (its
    ``*.json`` children). Sorted for deterministic partition order."""
    out: list[str] = []
    for raw in path_opt.split(","):
        p = os.path.expanduser(raw.strip())
        if not p:
            continue
        if os.path.isdir(p):
            out.extend(_glob.glob(os.path.join(p, "*.json")))
        elif _glob.has_magic(p):
            out.extend(_glob.glob(p))
        else:
            out.append(p)
    return sorted(set(out))


class NibbleWireDataSource(DataSource):
    """See module docstring. Options:

    - ``path`` (from ``.load(...)``): file / glob / directory, comma-OK.
    - ``series``: series name for every record; default = file basename
      without extension (the URL-path analogue).
    - ``mode``: ``lenient`` (default; any order of the allowed keys) or
      ``strict`` (the reference's exact field-order check, quirk Q3).
    - ``default_ts``: epoch-µs long assigned to records with no
      ``timestamp`` key; default = the ingest wall clock sampled ONCE at
      read setup (the reference's server-assigned-now,
      ``src/timeseries.re:37-44``, made deterministic under task
      retries) — pass it explicitly whenever reproducibility across
      read JOBS matters.
    """

    @classmethod
    def name(cls) -> str:
        return "nibble_wire"

    def schema(self):
        return POINT_SCHEMA

    def reader(self, schema) -> "NibbleWireReader":
        return NibbleWireReader(self.options)


class NibbleWireReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValidationError("nibble_wire requires a path (use .load(path))")
        self.paths = _expand(path)
        self.series = options.get("series")
        self.strict = options.get("mode", "lenient").lower() == "strict"
        raw_ts = options.get("default_ts")
        # Resolved ONCE, driver-side, at reader construction: a per-record
        # wall clock on the executor would make the source
        # non-deterministic under task retries / speculative execution /
        # lost-partition recomputation — the same file yielding different
        # ts values per attempt silently breaks downstream dedup and
        # exactly-once sinks. One ingest-time stamp per read job is the
        # deterministic rendering of the reference's server-assigned-now.
        from nibbledb_spark.schema import now_micros

        self.default_ts = int(raw_ts) if raw_ts is not None else now_micros()

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per file: a wire file is one request body (one
        # JSON document), the natural parallel unit
        return [_WireFilePartition(p) for p in self.paths]

    def read(self, partition: _WireFilePartition) -> Iterator[tuple]:
        path = partition.path
        series = self.series or os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            doc = json.load(f)
        if isinstance(doc, dict):
            doc = [doc]  # single-point POST body
        if not isinstance(doc, list):
            raise ValidationError(f"{path}: wire body must be a JSON array/object")
        for record in doc:
            if not isinstance(record, dict):
                raise ValidationError(f"{path}: bad wire record: {record!r}")
            ts, tag, value = validate_point(
                record, strict=self.strict, default_ts=self.default_ts
            )
            yield (series, ts, tag, value)


def register_wire_source(spark) -> None:
    """Idempotent per-session registration of the ``nibble_wire`` format."""
    spark.dataSource.register(NibbleWireDataSource)
