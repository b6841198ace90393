"""TimeSeriesEngine — the storage-backed engine.

Replaces the reference's Irmin/Git shard + index machinery
(src/shard.re, src/index.re, SURVEY.md §1.3) with a Spark-native
layout:

- one parquet dataset partitioned by ``bucket = pmod(xxhash64(series), B)``
  — bounded partition count regardless of series cardinality (the 100 TB
  stance: raw ``partitionBy(series)`` explodes with millions of series),
- rows sorted within files by (series, ts) at write so parquet row-group
  min/max statistics give the same pruning the reference's hand-rolled
  shard-range index provides (src/index.re:92-105) — maintained by the
  format, not by us,
- the "shard index" observability endpoint (A29) is derived from
  file-level footer stats via a manifest query, not a second store.

Mutation model: append for ingest; delete/compact rewrite only the
affected buckets via a STAGED SWAP (write survivors to a sibling staging
dir, then flip each bucket directory with atomic FS renames — see
_staged_swap) — the Spark equivalent of the reference's shard rewrite
(src/timeseries.re:259-303), with per-bucket atomicity standing in for
Irmin's transactional store. Like the reference, ingest never
deduplicates (quirk Q6).
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nibbledb_spark.operators import timeseries as ts_ops
from nibbledb_spark.schema import POINT_SCHEMA, validate_points

DEFAULT_NUM_BUCKETS = 32

# µs per day; the `day` partition column is ts div DAY_US (days since
# epoch). Two-level layout bucket=N/day=M: series-hash bounds the
# partition count in one dimension, day gives DIRECTORY-level time
# pruning that survives compaction — after merging a bucket into few
# files, row-group ts stats alone would cover the whole history, but the
# day dirs keep range scans proportional to the window queried. This is
# the scale analogue of the reference's shard-range index
# (src/index.re:92-105): maintained by the layout, consulted by Catalyst
# partition pruning, no second store.
DAY_US = 86_400_000_000

# on-disk layout: point columns + the partition columns. Reads use this
# schema explicitly so an empty (or fully-deleted) store is a valid
# empty DataFrame instead of an inference error.
STORE_SCHEMA = T.StructType(
    list(POINT_SCHEMA.fields)
    + [T.StructField("bucket", T.IntegerType()), T.StructField("day", T.IntegerType())]
)

# layout v2 = bucket/day two-level partitioning; v1 stores (bucket only)
# are not silently mixed — the store's meta pins its layout.
STORE_LAYOUT = 2

# Continuous-aggregate rollup (the hypertable-rollup analogue): per
# (series, time bucket) mergeable partials. Sums are scaled longs
# (1e-6 resolution) so merge order never changes the result —
# incremental maintenance is bit-identical to a full recompute, which
# is the pinned test. value_sum/value_mean are derived at read.
ROLLUP_SCALE = 1_000_000
ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("bucket_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_scaled", T.LongType()),
        T.StructField("vmin", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)


def bucket_of(series_col, num_buckets: int):
    return F.pmod(F.xxhash64(series_col), F.lit(num_buckets)).cast("int")


def day_of(ts_col):
    # floor division (matches Python's // used for read-side bounds;
    # double intermediate is exact: |day| < 2^26)
    return F.floor(ts_col / F.lit(DAY_US)).cast("int")


class TimeSeriesEngine:
    """Batch engine over a bucket-partitioned parquet points store."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        num_buckets: int = DEFAULT_NUM_BUCKETS,
        strict_ingest: bool = False,
    ) -> None:
        self.spark = spark
        self.path = path
        self.num_buckets = num_buckets
        self.strict_ingest = strict_ingest
        self._bucket_cache: dict[str, int] = {}
        # A store written with B buckets MUST be read with B buckets or
        # bucket pruning silently misses data: the store's own metadata
        # wins over the constructor argument. Same for the partition
        # layout version (a v1 bucket-only store must not be read or
        # appended with day-partition assumptions).
        meta = self._read_meta()
        if meta is not None:
            stored = meta.get("num_buckets")
            if stored is not None and stored != num_buckets:
                self.num_buckets = int(stored)
            self.layout = int(meta.get("layout", 1))
            widths = meta.get("rollup_widths")
            if widths is None and meta.get("rollup_every_us"):
                widths = [meta["rollup_every_us"]]  # pre-multi-width meta
            self.rollup_widths: list[int] = sorted(int(x) for x in (widths or []))
            self.retention_floor_us: int = int(meta.get("retention_floor_us", 0))
        else:
            self.layout = STORE_LAYOUT
            self.rollup_widths = []
            self.retention_floor_us = 0
        # heal any bucket swap interrupted by a crash (see _staged_swap)
        self._recover_staged_swap()

    @property
    def rollup_every_us(self) -> int | None:
        """Finest enabled rollup width (None when disabled) — the
        default read width and the back-compat single-width view."""
        return self.rollup_widths[0] if self.rollup_widths else None

    _META_FILE = "_nibbledb_meta.json"

    def _meta_path(self) -> str:
        return os.path.join(self.path, self._META_FILE)

    def _read_meta(self) -> dict | None:
        try:
            with open(self._meta_path()) as f:
                import json

                return dict(json.load(f))
        except (OSError, ValueError):
            return None

    def _write_meta(self, *, force: bool = False) -> None:
        if force or not os.path.exists(self._meta_path()):
            os.makedirs(self.path, exist_ok=True)
            import json

            meta: dict = {"num_buckets": self.num_buckets, "layout": self.layout}
            if self.rollup_widths:
                meta["rollup_widths"] = self.rollup_widths
            if self.retention_floor_us:
                meta["retention_floor_us"] = self.retention_floor_us
            with open(self._meta_path(), "w") as f:
                json.dump(meta, f)

    def _partition_cols(self) -> list[str]:
        return ["bucket", "day"] if self.layout >= 2 else ["bucket"]

    # -- write path --------------------------------------------------------

    def write(
        self, series: str, records: list[dict[str, Any]] | dict[str, Any]
    ) -> int:
        """Ingest one point or a batch (A1/A2). Validates the wire shape
        (strict mode = reference field-order fidelity, quirk Q3), assigns
        wall-clock µs timestamps when absent, appends to the store."""
        if isinstance(records, dict):
            records = [records]
        rows = [
            (series, t, tag, v)
            for (t, tag, v) in validate_points(records, strict=self.strict_ingest)
        ]
        df = self.spark.createDataFrame(rows, POINT_SCHEMA)
        self.append_points(df)
        return len(rows)

    def append_points(self, df: DataFrame) -> None:
        """Append canonical-schema points. Sorted within partitions by
        (series, ts) so row-group stats stay tight for time pruning; the
        day partition column gives directory-level time pruning on top
        (see DAY_US). First write stamps the store's bucket-count +
        layout metadata (underscore prefix keeps it invisible to Spark's
        file listing; swap the open() for the Hadoop FS API on a
        non-local store)."""
        self._write_meta()
        out = df.withColumn("bucket", bucket_of(F.col("series"), self.num_buckets))
        if self.layout >= 2:
            out = out.withColumn("day", day_of(F.col("ts")))

        def _write_main(src: DataFrame) -> None:
            (
                src.repartition("bucket")
                .sortWithinPartitions("series", "ts")
                .write.mode("append")
                .partitionBy(*self._partition_cols())
                .parquet(self.path)
            )

        if not self.rollup_widths:
            _write_main(out)
            return
        # With rollups enabled the input would otherwise be scanned
        # 1 + len(widths) times (main write + one partial-agg per
        # width, sequentially). Scan it ONCE into a cache, then run
        # the independent writes overlapped so stragglers back-fill
        # (the _lsh_write_tables pattern); coarser widths derive from
        # the finest width's partials where they nest — at 100 TB the
        # day rollup aggregates ~24 partial rows per bucket instead of
        # re-scanning the raw points. Measured 3 appends 9.6 s ->
        # ~5 s at sf0.1 (r15 opt).
        from concurrent.futures import ThreadPoolExecutor

        out = out.persist()
        try:
            pts = out.select("series", "ts", "value")
            widths = sorted(self.rollup_widths)
            finest = widths[0]
            # No eager count(): concurrent writers dedupe the cache fill
            # per partition (BlockManager getOrElseUpdate locks), so the
            # first job to need a block computes it and the rest reuse —
            # two fewer job launches per append.
            base = self._rollup_partials(pts, finest).persist()
            try:
                jobs = [lambda: _write_main(out)]

                def _write_width(every: int) -> None:
                    src = (
                        self._rollup_merge_partials(base, every)
                        if every != finest and every % finest == 0
                        else (base if every == finest
                              else self._rollup_partials(pts, every))
                    )
                    src.write.mode("append").parquet(self._rollup_dir(every))

                for every in widths:
                    jobs.append(lambda e=every: _write_width(e))
                with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
                    futures = [pool.submit(j) for j in jobs]
                    for f in futures:
                        f.result()
            finally:
                base.unpersist()
        finally:
            out.unpersist()

    # -- read path ---------------------------------------------------------

    def _store(self) -> DataFrame:
        """The raw store (with bucket column), schema-explicit so an
        empty or fully-deleted store reads as an empty DataFrame."""
        return self.spark.read.schema(STORE_SCHEMA).parquet(self.path)

    def points(
        self,
        ids: Sequence[str] = (),
        *,
        ts_from: int | None = None,
        ts_to: int | None = None,
    ) -> DataFrame:
        """The unified points DataFrame, optionally restricted to series
        ids and/or a time window. The bucket predicate is derived from
        the ids and the day predicate from the ts bounds, so Catalyst
        partition-prunes BOTH dimensions to only the relevant
        directories before any file is opened."""
        if not os.path.exists(self.path):
            df = self.spark.createDataFrame([], POINT_SCHEMA)
            if ts_from is not None:
                df = df.where(F.col("ts") >= ts_from)
            if ts_to is not None:
                df = df.where(F.col("ts") <= ts_to)
            return df
        df = self._store()
        if ids:
            buckets = sorted(
                {self._bucket_py(series_id) for series_id in ids}
            )
            df = df.where(F.col("bucket").isin(buckets))
            df = df.where(F.col("series").isin(list(ids)))
        if ts_from is not None:
            if self.layout >= 2:
                df = df.where(F.col("day") >= ts_from // DAY_US)
            df = df.where(F.col("ts") >= ts_from)
        if ts_to is not None:
            if self.layout >= 2:
                df = df.where(F.col("day") <= ts_to // DAY_US)
            df = df.where(F.col("ts") <= ts_to)
        return df.select("series", "ts", "tag", "value")

    def _bucket_py(self, series_id: str) -> int:
        # one tiny driver-side round-trip per distinct NEW id (memoized
        # thereafter). Kept exact with the JVM hash by asking the JVM.
        cached = self._bucket_cache.get(series_id)
        if cached is not None:
            return cached
        row = (
            self.spark.range(1)
            .select(bucket_of(F.lit(series_id), self.num_buckets).alias("b"))
            .collect()
        )
        b = row[0]["b"]
        self._bucket_cache[series_id] = b
        return b

    # query surface (thin delegation to the pure operators) -----------------

    def last(self, ids: Sequence[str], n: int) -> DataFrame:
        return ts_ops.last_n(self.points(ids), (), n)

    def latest(self, ids: Sequence[str]) -> DataFrame:
        return ts_ops.latest(self.points(ids), ())

    def first(self, ids: Sequence[str], n: int) -> DataFrame:
        return ts_ops.first_n(self.points(ids), (), n)

    def earliest(self, ids: Sequence[str]) -> DataFrame:
        return ts_ops.earliest(self.points(ids), ())

    def since(self, ids: Sequence[str], ts_from: int) -> DataFrame:
        return ts_ops.since(self.points(ids, ts_from=ts_from), (), ts_from)

    def range(self, ids: Sequence[str], ts_from: int, ts_to: int) -> DataFrame:
        return ts_ops.time_range(
            self.points(ids, ts_from=ts_from, ts_to=ts_to), (), ts_from, ts_to
        )

    def length(self, ids: Sequence[str] = ()) -> int:
        return self.points(ids).count()

    def names(self) -> list[str]:
        return [r["series"] for r in ts_ops.series_names(self.points()).collect()]

    def stats(self) -> DataFrame:
        return ts_ops.stats(self.points())

    def aggregate(self, ids: Sequence[str], agg: str, df: DataFrame | None = None):
        sel = df if df is not None else self.points(ids)
        return ts_ops.aggregate_result(sel, agg)

    def aggregate_range(
        self, ids: Sequence[str], ts_from: int, ts_to: int, agg: str
    ) -> dict[str, float]:
        """Range + aggregate with materialized-view routing: when the
        rollup is enabled, the aggregate is mergeable from its partials
        (sum/count/min/max/mean) and [ts_from, ts_to] is bucket-aligned,
        the answer comes from the rollup — proportional to series x
        buckets, not raw points. Anything else falls back to the raw
        scan. Routed sums inherit the rollup's 1e-6 scaled-long
        quantization (FLOAT parity class, same as the windowed
        aggregates). ``_last_agg_source`` records the route for tests."""
        # coarsest aligned width wins: fewest partial rows to merge
        every = next(
            (
                w
                for w in sorted(self.rollup_widths, reverse=True)
                if ts_from % w == 0 and (ts_to - ts_from + 1) % w == 0
            ),
            None,
        )
        if every and agg in ("sum", "count", "min", "max", "mean"):
            self._last_agg_source = "rollup"
            self._last_agg_width = every
            r = self.rollup(ids, ts_from=ts_from, ts_to=ts_to, every_us=every)
            exprs = {
                "sum": F.sum("value_sum"),
                "count": F.sum("n").cast("double"),
                "min": F.min("value_min"),
                "max": F.max("value_max"),
                "mean": F.sum("value_sum") / F.sum("n"),
            }
            val = r.agg(exprs[agg].alias(agg)).collect()[0][agg]
            if val is None:
                # A24 shaping: sum/count over empty are 0, the rest {}
                return {agg: 0.0} if agg in ("sum", "count") else {}
            return {agg: float(val)}
        if self.retention_floor_us and ts_from < self.retention_floor_us:
            # the raw fallback would silently aggregate over rows
            # apply_retention dropped — refuse with the fix spelled out
            raise ValueError(
                f"aggregate_range [{ts_from}, {ts_to}] reaches below the "
                f"retention floor {self.retention_floor_us} and cannot be "
                "served from raw points (they were dropped); align the "
                "window to an enabled rollup width and use a mergeable "
                f"aggregate (sum/count/min/max/mean), or start at/after "
                "the floor"
            )
        self._last_agg_source = "points"
        return self.aggregate(ids, agg, self.range(ids, ts_from, ts_to))

    # -- shard-index observability (A29) ------------------------------------

    def index(self, ids: Sequence[str] = ()) -> DataFrame:
        """Per-file (series, t_min, t_max, n) manifest — the engine's
        equivalent of the reference's shard index dump
        (src/index.re:79-90), derived from data, not a second store."""
        df = self.points(ids)
        return (
            df.groupBy(F.input_file_name().alias("file"), F.col("series"))
            .agg(
                F.min("ts").alias("t_min"),
                F.max("ts").alias("t_max"),
                F.count("*").alias("n"),
            )
            .orderBy("series", "t_min")
        )

    def index_length(self, ids: Sequence[str] = ()) -> int:
        return self.index(ids).count()

    # -- delete (A25/A26) ----------------------------------------------------

    def delete(
        self,
        ids: Sequence[str],
        ts_from: int,
        ts_to: int | None = None,
        *,
        tag_names: Sequence[str] | None = None,
        tag_values: Sequence[str] | None = None,
        tag_mode: str = "equals",
        compat_membership: bool = False,
    ) -> None:
        """Precise predicate delete (default), or the reference's
        timestamp-membership over-delete under ``compat_membership``
        (quirk Q2). Rewrites only the buckets containing listed series."""
        if not os.path.exists(self.path):
            # nothing flushed yet: deleting nonexistent series is 200 OK in
            # the reference, not a crash (mirror points()'s guard)
            return
        pred = ts_ops.delete_predicate(
            ids, ts_from, ts_to, tag_names, tag_values, tag_mode
        )
        buckets = sorted({self._bucket_py(s) for s in ids}) if ids else None

        store = self._store()
        affected = store.where(F.col("bucket").isin(buckets)) if buckets else store

        if compat_membership:
            victims = (
                affected.where(pred).select("series", "ts").distinct()
            )
            survivors = affected.join(victims, ["series", "ts"], "left_anti")
        else:
            survivors = affected.where(~pred | pred.isNull())

        # The staged swap never reads and overwrites the same path: compute
        # which buckets the rewrite touches, write survivors to a sibling
        # staging dir, then flip bucket directories with atomic renames.
        affected_buckets = (
            set(buckets)
            if buckets is not None
            else {r["bucket"] for r in store.select("bucket").distinct().collect()}
        )
        out = survivors.repartition("bucket").sortWithinPartitions("series", "ts")
        self._staged_swap(out, affected_buckets)
        # rollup partials for the deleted rows can't be subtracted
        # (min/max aren't invertible): refresh the derived table
        self.rollup_rebuild()

    # -- staged bucket swap (durability) ------------------------------------
    # The reference's Irmin store commits shard rewrites transactionally
    # (src/shard.re:26-34). A plain-parquet overwrite of the path being
    # lazily read is NOT that: a mid-commit failure can lose surviving rows
    # of rewritten buckets. The staged protocol restores per-bucket
    # atomicity with nothing but FS renames (atomic on local fs and HDFS):
    #
    #   1. write the rewritten buckets under <path>.__staging__ (a separate
    #      job — the store itself is only read, never written);
    #   2. per affected bucket: rename the live dir into <path>.__trash__,
    #      then rename the staged dir into place;
    #   3. drop trash + staging.
    #
    # Every bucket is wholly old or wholly new at all times. A crash
    # between the two renames leaves the bucket parked in trash, and
    # _recover_staged_swap (run at engine construction and before every
    # swap) renames it back. Cross-bucket transactionality — all buckets
    # flip together or not at all — still needs a log-backed table format
    # (Delta; NOTES.md item 5), which slots in at exactly these two
    # methods.

    def _fs(self):
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(self.path)
        return jvm, path.getFileSystem(conf)

    def _staging_dir(self) -> str:
        return self.path.rstrip("/") + ".__staging__"

    def _trash_dir(self) -> str:
        return self.path.rstrip("/") + ".__trash__"

    def _staged_swap(self, out: DataFrame, affected_buckets: set[int]) -> None:
        """Write ``out``'s buckets to staging, then atomically flip each
        affected bucket directory into the store. Buckets absent from
        ``out`` (all rows deleted) are dropped."""
        self._recover_staged_swap()  # heal any earlier interrupted swap
        jvm, fs = self._fs()
        P = jvm.org.apache.hadoop.fs.Path
        staging, trash = self._staging_dir(), self._trash_dir()
        fs.delete(P(staging), True)
        out.write.mode("overwrite").partitionBy(*self._partition_cols()).parquet(staging)
        fs.mkdirs(P(trash))
        for b in sorted(affected_buckets):
            live, staged = P(f"{self.path}/bucket={b}"), P(f"{staging}/bucket={b}")
            if fs.exists(live):
                fs.rename(live, P(f"{trash}/bucket={b}"))
            if fs.exists(staged):
                fs.rename(staged, live)
        fs.delete(P(trash), True)
        fs.delete(P(staging), True)

    def _recover_staged_swap(self) -> None:
        """Crash recovery: restore any bucket parked in trash whose live
        dir is missing (crash between the two renames), then clear
        leftover staging/trash. Idempotent; cheap when nothing to do."""
        if not (
            os.path.exists(self._trash_dir()) or os.path.exists(self._staging_dir())
        ):
            return  # fast path without JVM round-trips
        jvm, fs = self._fs()
        P = jvm.org.apache.hadoop.fs.Path
        trash = P(self._trash_dir())
        if fs.exists(trash):
            for status in fs.listStatus(trash):
                name = status.getPath().getName()
                live = P(f"{self.path}/{name}")
                if name.startswith("bucket=") and not fs.exists(live):
                    fs.rename(status.getPath(), live)
            fs.delete(trash, True)
        fs.delete(P(self._staging_dir()), True)

    # -- continuous-aggregate rollup (hypertable-rollup analogue) ------------
    # A materialized downsample maintained INCREMENTALLY: each append also
    # writes the batch's per-(series, bucket) partials — count, scaled-long
    # sum, min, max, all mergeable — into <path>/_rollup (the underscore
    # keeps it invisible to the main store's file listing). Reads merge the
    # partials with one tiny hash aggregate, so queries over a year of
    # history touch rollup rows, not raw points: the aggregate is computed
    # once at WRITE time per batch, not per query. Scaled-long sums make
    # the merge associativity-proof — incremental state is bit-identical
    # to a full recompute (pinned test). compact() consolidates the delta
    # rows; delete() rebuilds (a derived table refresh, standard for
    # materialized aggregates). A missing/partial rollup dir is never a
    # correctness risk: rollup() rebuilds it from the points store.

    def _rollup_dir(self, every_us: int) -> str:
        return os.path.join(self.path, f"_rollup_{every_us}")

    def enable_rollup(self, every_us: int = 3_600_000_000) -> None:
        """Enable rollup maintenance at ``every_us`` bucket width (and
        build it from any existing points). Call repeatedly for a
        HIERARCHY of widths (e.g. hour + day): each append then writes
        one tiny partial-agg per width, and range-aggregate routing
        picks the coarsest aligned width (aggregate_range)."""
        every_us = int(every_us)
        if every_us <= 0:
            raise ValueError("rollup width must be positive")
        if every_us in self.rollup_widths:
            return
        if self.retention_floor_us:
            # Refuse BEFORE mutating state: raw points below the floor
            # are gone, so a new width's pre-floor buckets are primary
            # data that never existed — and registering the width first
            # would leave a phantom entry whose dir can never be built,
            # failing every later rebuild.
            raise ValueError(
                f"cannot enable a new rollup width {every_us} after "
                f"retention (floor {self.retention_floor_us}): its "
                "pre-floor aggregates are primary data that cannot be "
                "rebuilt from dropped raw points"
            )
        self.rollup_widths = sorted(self.rollup_widths + [every_us])
        if os.path.exists(self.path):
            self._write_meta(force=True)
            self.rollup_rebuild(every_us)

    def _rollup_partials(self, pts: DataFrame, every_us: int) -> DataFrame:
        every = F.lit(every_us)
        return pts.groupBy(
            "series", (F.col("ts") - F.pmod(F.col("ts"), every)).alias("bucket_us")
        ).agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * F.lit(float(ROLLUP_SCALE)) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("sum_scaled"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )

    def _rollup_merge_partials(
        self, partials: DataFrame, every_us: int
    ) -> DataFrame:
        """Partials at a COARSER nesting width from finer partials
        (every_us must be a multiple of the finer width). Exact by the
        same associativity argument as the read-path merge: n and
        sum_scaled are longs, min/max are order-free — for ts = qW + r
        with W % f == 0, (ts - ts%f) re-bucketed at W lands on qW, the
        same bucket the point maps to directly."""
        every = F.lit(every_us)
        return partials.groupBy(
            "series",
            (F.col("bucket_us") - F.pmod(F.col("bucket_us"), every)).alias(
                "bucket_us"
            ),
        ).agg(
            F.sum("n").alias("n"),
            F.sum("sum_scaled").alias("sum_scaled"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )

    def rollup(
        self,
        ids: Sequence[str] = (),
        *,
        ts_from: int | None = None,
        ts_to: int | None = None,
        every_us: int | None = None,
    ) -> DataFrame:
        """Merged rollup view at ``every_us`` (default: the finest
        enabled width): (series, bucket_us, n, value_sum, value_min,
        value_max, value_mean), optionally filtered. The only work is a
        hash aggregate over the (small) partial rows."""
        if not self.rollup_widths:
            raise ValueError("rollup not enabled; call enable_rollup()")
        every = every_us or self.rollup_every_us
        if every not in self.rollup_widths:
            raise ValueError(f"no rollup at width {every}; enabled: {self.rollup_widths}")
        rdir = self._rollup_dir(every)
        if os.path.exists(self.path) and not os.path.exists(rdir):
            self.rollup_rebuild(every)  # derived data: absence just means rebuild
        df = self.spark.read.schema(ROLLUP_SCHEMA).parquet(rdir) \
            if os.path.exists(rdir) \
            else self.spark.createDataFrame([], ROLLUP_SCHEMA)
        if ids:
            df = df.where(F.col("series").isin(list(ids)))
        if ts_from is not None:
            df = df.where(F.col("bucket_us") >= ts_from - ts_from % every)
        if ts_to is not None:
            df = df.where(F.col("bucket_us") <= ts_to)
        merged = df.groupBy("series", "bucket_us").agg(
            F.sum("n").alias("n"),
            F.sum("sum_scaled").alias("sum_scaled"),
            F.min("vmin").alias("value_min"),
            F.max("vmax").alias("value_max"),
        )
        s = F.col("sum_scaled").cast("double") / F.lit(float(ROLLUP_SCALE))
        return merged.select(
            "series",
            "bucket_us",
            "n",
            s.alias("value_sum"),
            "value_min",
            "value_max",
            (s / F.col("n")).alias("value_mean"),
        )

    def rollup_rebuild(self, every_us: int | None = None) -> None:
        """Full refresh from the points store (after delete, or when a
        rollup dir is lost); None refreshes every enabled width."""
        if not os.path.exists(self.path):
            return
        import shutil

        widths = [every_us] if every_us else self.rollup_widths
        pts = self.points()
        floor = self.retention_floor_us
        if floor:
            # Below the retention floor the rollup rows are PRIMARY data
            # (their raw points were dropped by apply_retention) — they
            # cannot be recomputed, only carried forward. Raw points, if
            # any remain below the floor mid-retention, are excluded so
            # nothing double-counts.
            pts = pts.where(F.col("ts") >= floor)
        for every in widths:
            rdir = self._rollup_dir(every)
            tmp = rdir + ".__rebuild__"
            shutil.rmtree(tmp, ignore_errors=True)
            fresh = self._rollup_partials(pts, every)
            if floor:
                if not os.path.exists(rdir):
                    raise ValueError(
                        f"rollup dir for width {every} is missing but the "
                        f"retention floor is {floor}: the pre-floor "
                        "aggregates are primary data and cannot be rebuilt "
                        "from raw points (they were dropped). Restore the "
                        "rollup dir from backup, or enable this width "
                        "before applying retention."
                    )
                kept = self.spark.read.schema(ROLLUP_SCHEMA).parquet(rdir).where(
                    F.col("bucket_us") < floor
                )
                fresh = kept.unionByName(fresh)
            fresh.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(rdir, ignore_errors=True)
            os.rename(tmp, rdir)

    def apply_retention(self, older_than_us: int) -> None:
        """Data-lifecycle retention (the TimescaleDB drop_chunks +
        continuous-aggregate pattern): DROP raw points with
        ``ts < older_than_us`` while the rollup aggregates over the
        dropped range stay queryable forever — at 100 TB this is the
        difference between storing raw telemetry for 30 days vs 5
        years of hourly aggregates in a fraction of the footprint.

        Contract:
        - requires at least one enabled rollup width, and the cutoff
          must be bucket-ALIGNED to every enabled width (no bucket may
          straddle the cutoff, or its partial would mix dropped and
          kept points);
        - rollups are consolidated and materialized for every width
          BEFORE any raw row is dropped;
        - below the new floor, rollup rows become PRIMARY data:
          ``rollup_rebuild`` carries them forward instead of
          recomputing (and refuses to run if the rollup dir vanished);
          ``enable_rollup`` for a NEW width after retention refuses for
          the same reason;
        - raw reads (last/first/since/range) only see ``ts >= cutoff``
          afterwards; ``aggregate_range`` keeps answering over the
          dropped range from the rollup route.

        Retention is monotone: a second call must not lower the floor.
        """
        if not self.rollup_widths:
            raise ValueError(
                "retention requires an enabled rollup: the dropped raw "
                "points' aggregates must live somewhere (enable_rollup())"
            )
        if older_than_us <= 0:
            raise ValueError(f"retention cutoff must be positive: {older_than_us}")
        if older_than_us < self.retention_floor_us:
            raise ValueError(
                f"retention floor cannot move backwards: have "
                f"{self.retention_floor_us}, got {older_than_us}"
            )
        misaligned = [w for w in self.rollup_widths if older_than_us % w]
        if misaligned:
            raise ValueError(
                f"retention cutoff {older_than_us} is not bucket-aligned to "
                f"enabled rollup widths {misaligned}: a straddling bucket "
                "would mix dropped and kept points"
            )
        if not os.path.exists(self.path):
            return
        # materialize every width from the still-complete raw store,
        # then pin the floor BEFORE dropping rows (a crash between the
        # two leaves a too-early floor and intact raw — safe; the
        # reverse order could drop raw with no aggregate anywhere)
        self.rollup_rebuild()
        self.retention_floor_us = older_than_us
        self._write_meta(force=True)
        self.delete((), -(2**62), older_than_us - 1)

    def _rollup_consolidate(self) -> None:
        """Merge accumulated per-append delta rows to one row per
        (series, bucket) in every width: the rollup's own compaction."""
        import shutil

        for every in self.rollup_widths:
            rdir = self._rollup_dir(every)
            if not os.path.exists(rdir):
                continue
            df = self.spark.read.schema(ROLLUP_SCHEMA).parquet(rdir)
            merged = df.groupBy("series", "bucket_us").agg(
                F.sum("n").alias("n"),
                F.sum("sum_scaled").alias("sum_scaled"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
            tmp = rdir + ".__rebuild__"
            shutil.rmtree(tmp, ignore_errors=True)
            merged.select(*[f.name for f in ROLLUP_SCHEMA.fields]).write.mode(
                "overwrite"
            ).parquet(tmp)
            shutil.rmtree(rdir, ignore_errors=True)
            os.rename(tmp, rdir)

    # -- compaction (A4 analogue) -------------------------------------------

    def compact(self, *, files_per_bucket: int = 1) -> None:
        """Overlap-merge compaction analogue: rewrite every bucket into
        (series, ts)-sorted files. Read-result invariance is the pinned
        test. On a cluster this is the scheduled OPTIMIZE job.

        ``files_per_bucket`` bounds output file size at scale: rows
        split deterministically by series hash within each bucket, so
        each file still holds contiguous (series, ts) runs and row-group
        pruning stays tight. Appends between compactions create small
        files; this job re-tightens the layout.

        Durability: staged bucket swap (see _staged_swap) — every bucket
        directory is wholly old or wholly new at any instant; an
        interrupted swap is healed on the next engine construction."""
        if not os.path.exists(self.path):
            return  # empty store: nothing to compact
        store = self._store()
        affected = {r["bucket"] for r in store.select("bucket").distinct().collect()}
        if files_per_bucket > 1:
            split = F.pmod(F.xxhash64("series"), F.lit(files_per_bucket))
            out = store.repartition(
                self.num_buckets * files_per_bucket, "bucket", split
            )
        else:
            out = store.repartition("bucket")
        self._staged_swap(out.sortWithinPartitions("series", "ts"), affected)
        self._rollup_consolidate()
