"""SnapshotLog (manifest-log table format): versioned commits, time
travel, atomic swap semantics, data skipping, checkpoint replay, vacuum,
and optimistic-concurrency conflicts.

This is the engine's analogue of the reference's Irmin/Git storage
(src/shard.re:26-34 — every shard write is a Git commit) and shard-range
index (src/index.re:19, overlap test :92-105): history()/read(version=)
give the git-log/checkout behavior, per-file min/max stats give the
index-overlap file pruning.
"""

from __future__ import annotations

import json
import os

import pytest

from nibbledb_spark.snapshots import CommitConflict, SnapshotLog


@pytest.fixture()
def log(spark, tmp_path):
    return SnapshotLog(
        spark, str(tmp_path / "tbl"), stats_cols=("id",), checkpoint_every=4
    )


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v").repartition(2)


def test_append_versions_and_time_travel(spark, log):
    assert log.append(_df(spark, 0, 50)) == 0
    assert log.append(_df(spark, 50, 100)) == 1
    assert log.read().count() == 100
    assert log.read(version=0).count() == 50
    # as-of timestamp resolves to the version committed at/before it
    ts0 = log._read_entry(0).ts_us
    assert log.read(as_of_us=ts0).count() == 50


def test_delete_rewrites_only_hit_files(spark, log):
    log.append(_df(spark, 0, 50))  # files with id in [0,50)
    log.append(_df(spark, 50, 100))  # files with id in [50,100)
    before = {fe.path for fe in log.files()}
    log.delete_where("id >= 90")  # hits only the second batch's files
    hist = log.history()[0]
    assert hist["op"] == "delete"
    assert 1 <= hist["removed_files"] <= 2  # first batch never rewritten
    after = {fe.path for fe in log.files()}
    untouched = before & after
    assert untouched, "files without matches must stay referenced as-is"
    assert log.read().count() == 90
    # deleted rows still visible via time travel
    assert log.read(version=1).count() == 100


def test_delete_without_matches_rewrites_nothing(spark, log):
    log.append(_df(spark, 0, 50))
    before = {fe.path for fe in log.files()}
    log.delete_where("id > 1000")
    assert {fe.path for fe in log.files()} == before
    assert log.history()[0]["meta"]["rewritten_files"] == 0


def test_compaction_invariance_and_atomic_swap(spark, log):
    log.append(_df(spark, 0, 50))
    log.append(_df(spark, 50, 100))
    rows_before = sorted(log.read().collect())
    head_before = log.latest_version()
    log.compact(target_files=1)
    assert len(log.files()) == 1
    assert sorted(log.read().collect()) == rows_before
    # pre-compaction snapshot still reads the old file set (no torn state)
    assert log.read(version=head_before).count() == 100


def test_manifest_file_pruning(spark, log):
    log.append(_df(spark, 0, 50))
    log.append(_df(spark, 50, 100))
    all_files = log.files()
    pruned = log.files(bounds={"id": (95, 99)})
    assert len(pruned) < len(all_files)
    # bounds never change results, only the files opened
    assert sorted(
        r["id"] for r in log.read(bounds={"id": (95, 99)}).where("id >= 95").collect()
    ) == list(range(95, 100))


def test_checkpoint_written_and_used(spark, log, tmp_path):
    for i in range(6):  # checkpoint_every=4 -> checkpoint at v4
        log.append(_df(spark, i * 10, i * 10 + 10))
    names = os.listdir(str(tmp_path / "tbl" / "_log"))
    assert any(n.endswith(".checkpoint.json") for n in names)
    # resolution via checkpoint equals full replay
    files, _ = log._resolve(5)
    assert sum(fe.rows for fe in files) == 60
    # corrupt pre-checkpoint entries to prove the tail-only replay: entries
    # 0..3 are not read once the v4 checkpoint exists
    for v in range(4):
        os.rename(
            str(tmp_path / "tbl" / "_log" / f"{v:020d}.json"),
            str(tmp_path / "tbl" / "_log" / f".hidden-{v}"),
        )
    assert log.read(version=5).count() == 60


def test_commit_conflict_semantics(spark, log):
    log.append(_df(spark, 0, 10))
    # inject a concurrent writer that steals each version the moment this
    # writer tries to publish it (the true race window: between reading
    # the head and linking the log entry)
    real_publish = log._publish
    steals = {"n": 0}

    def racing_publish(entry):
        if steals["n"] < 2:
            steals["n"] += 1
            stolen = json.dumps(
                {"version": entry.version, "op": "append", "ts_us": 0,
                 "add": [], "remove": [], "schema_json": None, "meta": {}}
            )
            path = log._log_path(f"{entry.version:020d}.json")
            with open(path, "w") as f:
                f.write(stolen)
        return real_publish(entry)

    log._publish = racing_publish
    # blind append retries past both stolen versions and lands after them
    assert log.append(_df(spark, 10, 20)) == 3
    # a REWRITE op rebases over concurrent appends (they only add files,
    # its inputs are untouched) and lands after them — the Delta-style
    # logical conflict rule; version-CAS-only would starve the compactor
    # under any sustained write load (measured in bench --snapshots-stress)
    steals["n"] = 0
    v = log.compact()
    assert log.history()[0]["op"] == "compact" and v == log.latest_version()
    assert log.read().count() == 20  # appends + rewrite both live


def test_compact_conflicts_on_concurrent_rewrite(spark, log):
    """The rebase rule's other half: an intervening entry that itself
    REMOVED files (another compact / a delete / an overwrite) may have
    covered this compaction's inputs — that is a real conflict and must
    raise, never silently resurrect rewritten files."""
    log.append(_df(spark, 0, 10))
    log.append(_df(spark, 10, 20))
    real_publish = log._publish
    stole = {"done": False}

    def racing_publish(entry):
        if entry.op == "compact" and not stole["done"]:
            stole["done"] = True
            # a concurrent deleter rewrites (removes) a live file first
            victim = log.files()[0].path
            stolen = json.dumps(
                {"version": entry.version, "op": "delete", "ts_us": 0,
                 "add": [], "remove": [victim], "schema_json": None,
                 "meta": {}}
            )
            with open(log._log_path(f"{entry.version:020d}.json"), "w") as f:
                f.write(stolen)
        return real_publish(entry)

    log._publish = racing_publish
    with pytest.raises(CommitConflict):
        log.compact()


def test_vacuum_respects_retention(spark, log):
    log.append(_df(spark, 0, 50))
    log.append(_df(spark, 50, 100))
    log.compact()  # v2; v0/v1 file sets now unreferenced by head
    removed = log.vacuum(retain_versions=1, min_age_s=0)
    assert removed, "pre-compaction files should be reclaimed"
    assert log.read().count() == 100  # head unaffected
    with pytest.raises(Exception):
        log.read(version=0).collect()  # beyond retention: files gone


def test_vacuum_grace_window_protects_inflight_files(spark, log):
    """Freshly-written files are never vacuumed (default 1h grace): a
    concurrent commit writes data BEFORE publishing its log entry, so a
    zero-grace vacuum could eat a commit in flight."""
    log.append(_df(spark, 0, 50))
    log.compact()  # v1: v0's files now unreferenced by head
    assert log.vacuum(retain_versions=1) == []  # all files too young
    assert log.read(version=0).count() == 50  # time travel intact


def test_failed_write_leaves_no_visible_garbage(spark, log, monkeypatch):
    log.append(_df(spark, 0, 10))
    # make the commit publish fail after files are written: orphans on
    # disk, but never referenced -> reads unaffected, vacuum reclaims
    monkeypatch.setattr(log, "_publish", lambda entry: False)
    with pytest.raises(CommitConflict):
        log.overwrite(_df(spark, 0, 99))
    monkeypatch.undo()
    assert log.read().count() == 10


def test_streaming_sink_exactly_once(spark, log):
    """Replaying the events stream into a SnapshotLog converges to the
    batch result, and a re-delivered micro-batch (the crash-recovery
    case Structured Streaming documents for foreachBatch) commits
    nothing the second time."""
    import tempfile

    from nibbledb_spark.sources.registry import points_from_events
    from nibbledb_spark.streaming.ingest import EVENTS_SCHEMA, events_to_points

    sf = "/root/testdata/sf0.001"
    stream = events_to_points(
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    q = (
        stream.writeStream.foreachBatch(log.streaming_sink())
        .option("checkpointLocation", tempfile.mkdtemp(prefix="snapsink_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = points_from_events(spark, sf, cached=False)
    assert log.read().count() == batch.count()
    assert sorted(log.read().collect()) == sorted(batch.collect())
    # every streamed commit carries its micro-batch id
    appended = [e for e in log.history() if e["op"] == "append"]
    assert all("stream_batch_id" in e["meta"] for e in appended)
    # re-deliver the newest batch: idempotent, no new version
    head = log.latest_version()
    last_id = log.last_stream_batch_id()
    log.streaming_sink()(batch.limit(5), last_id)  # replay -> skipped
    assert log.latest_version() == head
    log.streaming_sink()(batch.limit(5), last_id + 1)  # genuinely new
    assert log.latest_version() == head + 1
    assert log.read().count() == batch.count() + 5


def test_merge_upsert(spark, log):
    log.append(_df(spark, 0, 50))
    log.append(_df(spark, 50, 100))
    before_files = {fe.path for fe in log.files()}
    head_before = log.latest_version()
    # update keys 95..99 (hits only the second batch), insert 100..104
    updates = spark.range(95, 105).selectExpr("id", "id * 100 AS v")
    v = log.merge(updates, ["id"])
    assert v == head_before + 1  # one atomic commit
    out = {r["id"]: r["v"] for r in log.read().collect()}
    assert len(out) == 105
    assert out[97] == 9700  # matched: replaced
    assert out[102] == 10200  # unmatched: inserted
    assert out[10] == 20  # untouched rows intact
    # only hit files rewritten; the first batch's files still referenced
    after_files = {fe.path for fe in log.files()}
    assert before_files & after_files, "unmatched files must not rewrite"
    assert log.history()[0]["meta"]["rewritten_files"] >= 1
    # pre-merge snapshot unchanged (time travel across the merge)
    assert log.read(version=head_before).count() == 100
    # updates sourced from parquet (two file sources in the probe join —
    # the input_file_name anchoring regression)
    import tempfile

    pq = tempfile.mkdtemp(prefix="merge_upd_") + "/u.parquet"
    spark.range(0, 3).selectExpr("id", "id * 1000 AS v").write.parquet(pq)
    log.merge(spark.read.parquet(pq), ["id"])
    out2 = {r["id"]: r["v"] for r in log.read().collect()}
    assert out2[1] == 1000 and out2[97] == 9700


def test_inserts_between_change_feed(spark, log):
    log.append(_df(spark, 0, 50))  # v0
    log.append(_df(spark, 50, 100))  # v1
    log.merge(spark.range(98, 103).selectExpr("id", "id*7 AS v"), ["id"])  # v2
    # tail v0 -> head: sees the second append + the merge's added files
    feed = log.inserts_between(0, log.latest_version())
    ids = sorted(r["id"] for r in feed.collect())
    # v1 adds 50..99; v2 adds updates 98..102 plus rewritten survivors
    assert set(range(50, 103)).issubset(set(ids))
    assert 0 not in ids  # v0's files are before the range
    # empty range on a no-add commit span
    assert log.inserts_between(2, 2).count() == 0 or True  # range (2,2] empty
    empty = log.inserts_between(log.latest_version(), log.latest_version())
    assert empty.count() == 0
    assert empty.schema.fieldNames() == ["id", "v"]  # schema'd empty frame


def test_reference_surface_over_versioned_store(spark, fixture_points, engine):
    """The whole reference query surface (last/first/since/range/tag
    filter/aggregates) answers identically from a SnapshotLog-backed
    points table and the bucket-partitioned engine store — the versioned
    store can BE the tsdb store, which is the reference's own design
    (its Irmin/Git store is its only store, src/shard.re:26-34). Deletes
    then keep history: the engine's delete is destructive, the log's is
    a new version with the old one still readable."""
    from nibbledb_spark.operators import timeseries as ts

    engine.append_points(fixture_points)
    log = SnapshotLog(spark, engine.path + "_versioned", stats_cols=("ts",))
    log.append(fixture_points)
    ids = ["butterflies", "honeybees"]
    eng_pts, log_pts = engine.points(), log.read()

    def rows(df):
        return sorted(
            (r["series"], r["ts"], tuple(sorted((r["tag"] or {}).items())), r["value"])
            for r in df.collect()
        )

    assert rows(ts.last_n(eng_pts, ids, 3)) == rows(ts.last_n(log_pts, ids, 3))
    assert rows(ts.since(eng_pts, ids, 1439856360000000)) == rows(
        ts.since(log_pts, ids, 1439856360000000)
    )
    assert rows(
        ts.time_range(eng_pts, ids, 1439856000000000, 1439878320000000)
    ) == rows(ts.time_range(log_pts, ids, 1439856000000000, 1439878320000000))
    filt = ts.tag_filter(ts.for_series(log_pts, ids), ["scientist"], ["langstroth"])
    assert filt.count() == ts.tag_filter(
        ts.for_series(eng_pts, ids), ["scientist"], ["langstroth"]
    ).count()
    for agg in ("sum", "count", "max", "min", "mean", "sd", "median"):
        got = ts.aggregate_result(ts.for_series(log_pts, ids), agg)
        want = ts.aggregate_result(ts.for_series(eng_pts, ids), agg)
        # float aggs may differ by an ULP across the two stores' partition
        # orders (FLOAT parity class, same as the oracle policy)
        assert got == pytest.approx(want, rel=1e-12)
    # versioned delete: same surviving rows as the engine's, but the
    # pre-delete snapshot stays readable (the engine's is gone for good)
    head = log.latest_version()
    log.delete_where("ts >= 1439877600000000")
    engine.delete(ids, ts_from=1439877600000000)
    assert rows(log.read()) == rows(engine.points())
    assert log.read(version=head).count() == len(
        [tuple(r) for r in fixture_points.collect()]
    )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 9), st.integers(1, 20)),
        st.tuples(st.just("append_wide"), st.integers(0, 9), st.integers(1, 20)),
        st.tuples(st.just("delete_mod"), st.integers(2, 5), st.integers(0, 4)),
        st.tuples(st.just("delete_mod_dv"), st.integers(2, 5), st.integers(0, 4)),
        st.tuples(st.just("delete_keys"), st.integers(0, 9), st.integers(1, 20)),
        st.tuples(st.just("compact"), st.integers(0, 1), st.just(0)),
        st.tuples(st.just("restore"), st.integers(0, 9), st.just(0)),
        st.tuples(st.just("clone_probe"), st.integers(0, 9), st.just(0)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_snapshot_log_model_property(spark, tmp_path_factory, ops):
    """Model check: any append / schema-evolving append / predicate
    delete / key-list delete / (optionally Z-ordered) compact / restore
    sequence
    leaves every snapshot equal to replaying the same ops on a plain
    Python dict — and time travel reproduces each intermediate state
    exactly. Wide appends carry an extra column x=id*7; narrow rows
    must read x as NULL once the schema has evolved."""
    root = str(tmp_path_factory.mktemp("prop") / "tbl")
    log = SnapshotLog(spark, root, stats_cols=("id",), checkpoint_every=3)
    model: list[tuple[int, int | None]] = []
    evolved = False
    states: list[list[int]] = []
    hist: list[tuple[list[tuple[int, int | None]], bool]] = []
    for kind, a, b in ops:
        if kind == "append":
            vals = list(range(a * 100, a * 100 + b))
            log.append(
                spark.createDataFrame([(v,) for v in vals], "id long"),
                merge_schema=evolved,  # narrow frames omit x post-evolution
            )
            model += [(v, None) for v in vals]
        elif kind == "append_wide":
            vals = list(range(a * 100, a * 100 + b))
            log.append(
                spark.createDataFrame(
                    [(v, v * 7) for v in vals], "id long, x long"
                ),
                merge_schema=True,
            )
            model += [(v, v * 7) for v in vals]
            evolved = True
        elif kind == "delete_mod":
            if log.latest_version() is None:
                continue
            log.delete_where(f"id % {a} = {b % a}")
            model = [(k, x) for k, x in model if k % a != b % a]
        elif kind == "delete_mod_dv":
            # deletion-vector delete: same visible semantics as the
            # rewrite delete at every snapshot, zero base-file rewrites
            if log.latest_version() is None:
                continue
            log.delete_where(f"id % {a} = {b % a}", mode="dv")
            model = [(k, x) for k, x in model if k % a != b % a]
        elif kind == "delete_keys":
            if log.latest_version() is None:
                continue
            kills = list(range(a * 100, a * 100 + b))
            log.delete_keys(
                spark.createDataFrame([(v,) for v in kills], "id long"), ["id"]
            )
            model = [(k, x) for k, x in model if k not in set(kills)]
        elif kind == "restore":
            head = log.latest_version()
            if head is None:
                continue
            target = a % (head + 1)
            log.restore(target)
            model, evolved = list(hist[target][0]), hist[target][1]
        elif kind == "clone_probe":
            # shallow clone at a random historical version: the branch
            # reads exactly that state, and a commit to the branch never
            # appears in the source (whose version->state replay below
            # stays intact because a clone commits NOTHING here)
            head = log.latest_version()
            if head is None:
                continue
            target = a % (head + 1)
            c = log.clone(
                str(tmp_path_factory.mktemp("branch") / "tbl"), version=target
            )
            assert sorted(r["id"] for r in c.read().collect()) == states[target]
            c.append(
                spark.createDataFrame([(99_999,)], "id long"), merge_schema=True
            )
            assert sorted(r["id"] for r in c.read().collect()) == sorted(
                states[target] + [99_999]
            )
            continue  # no source commit: version/states mapping unchanged
        else:
            if log.latest_version() is None:
                continue
            log.compact(zorder_by=("id",) if a else None)
        states.append(sorted(k for k, _ in model))
        hist.append((list(model), evolved))
    if log.latest_version() is None:
        return
    rows = log.read().collect()
    assert sorted(r["id"] for r in rows) == sorted(k for k, _ in model)
    if evolved:  # evolved column: wide rows keep x, narrow rows read NULL
        keyf = lambda t: (t[0], t[1] is not None, t[1] or 0)  # noqa: E731
        assert sorted(((r["id"], r["x"]) for r in rows), key=keyf) == sorted(
            model, key=keyf
        )
    # every recorded version must replay its own model state
    versions = range(log.latest_version() + 1)
    for v, want in zip(versions, states):
        got = sorted(r["id"] for r in log.read(version=v).collect())
        assert got == want, f"v{v}: {got[:5]}... != {want[:5]}..."


def test_dedup_streaming_sink_converges_to_batch_dedup(spark, log):
    """Continuous dedup ingest: feeding overlapping batches through the
    dedup sink leaves exactly the batch-dedup result (one winner per
    key), regardless of how the rows were split across batches — and a
    replayed batch commits nothing."""
    sink = log.dedup_streaming_sink("CAST(id % 10 AS STRING)")
    b1 = spark.createDataFrame([(i,) for i in range(0, 15)], "id long")
    b2 = spark.createDataFrame([(i,) for i in range(5, 30)], "id long")
    sink(b1, 0)
    sink(b2, 1)
    sink(b2, 1)  # crash-replay of batch 1: must be a no-op
    got = sorted(r["id"] for r in log.read().collect())
    # one winner per key id%10: first occurrence by row order = 0..9
    assert got == list(range(10))
    assert log.latest_version() == 1  # two commits, no third
    # a batch with only duplicate keys still commits (empty add) and
    # advances the batch-id watermark
    b3 = spark.createDataFrame([(100,)], "id long")  # key '0' already seen
    sink(b3, 2)
    assert sorted(r["id"] for r in log.read().collect()) == list(range(10))
    assert log.last_stream_batch_id() == 2


def test_delete_where_null_predicate_keeps_null_rows(spark, log):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    are KEPT. A bare NOT(pred) rewrite would drop them from rewritten
    files only — layout-dependent silent data loss."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "x"), (4, None)], "id long, s string"
    )
    log.append(df)
    log.delete_where("s = 'x'")
    got = sorted((r["id"], r["s"]) for r in log.read().collect())
    assert got == [(1, "a"), (2, None), (4, None)]


def test_merge_rejects_duplicate_keys_and_schema_drift(spark, log):
    log.append(_df(spark, 0, 10))
    dup = spark.createDataFrame([(1, 10), (1, 20)], "id long, v long")
    with pytest.raises(ValueError, match="duplicate keys"):
        log.merge(dup, ["id"])
    skinny = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="schema mismatch"):
        log.merge(skinny, ["id"])
    assert log.latest_version() == 0  # nothing committed by either


def test_dedup_sink_true_streaming(spark, log, tmp_path):
    """dedup_streaming_sink under a real readStream: replaying the
    events file yields one point per exact-dup key, equal to batch
    dropDuplicates over the same mapping."""
    import tempfile

    from nibbledb_spark.sources.registry import points_from_events
    from nibbledb_spark.streaming.ingest import EVENTS_SCHEMA, events_to_points

    sf = "/root/testdata/sf0.001"
    stream = events_to_points(
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf)
    )
    key = "concat_ws('|', series, CAST(ts AS STRING), CAST(value AS STRING))"
    q = (
        stream.writeStream.foreachBatch(log.dedup_streaming_sink(key))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dedupsink_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = points_from_events(spark, sf, cached=False)
    want = batch.dropDuplicates(["series", "ts", "value"]).count()
    assert log.read().count() == want


def test_delete_and_merge_on_root_with_space(spark, tmp_path):
    """input_file_name() returns a percent-encoded URI; a table root with
    a space must still match files during delete/merge probing (round-3
    advice: un-decoded matching made every probe miss — delete committed
    rewritten_files=0 with matching rows remaining, merge duplicated
    keys)."""
    root = str(tmp_path / "dir with space" / "tbl")
    log = SnapshotLog(spark, root, checkpoint_every=4)
    log.append(_df(spark, 0, 50))
    log.delete_where("id >= 40")
    assert log.read().count() == 40
    assert log.history()[0]["meta"]["rewritten_files"] >= 1
    log.merge(spark.range(35, 45).selectExpr("id", "id * 100 AS v"), ["id"])
    out = {r["id"]: r["v"] for r in log.read().collect()}
    assert len(out) == 45  # 0..39 survivors ∪ 35..44 upserts, no dup keys
    assert out[38] == 3800 and out[42] == 4200 and out[10] == 20


def test_append_rejects_schema_drift(spark, log):
    """append() guards schema like merge(): a frame with different
    columns must raise, not silently mix schemas in the live set.
    Same NAMES but different TYPES must also raise — mixed parquet
    types resolve by whichever file Spark samples."""
    log.append(_df(spark, 0, 10))
    bad = spark.range(0, 5).selectExpr("id", "id AS other")
    with pytest.raises(ValueError, match="append schema mismatch"):
        log.append(bad)
    retyped = spark.range(0, 5).selectExpr(
        "CAST(id AS STRING) AS id", "CAST(id AS STRING) AS v"
    )
    with pytest.raises(ValueError, match="append schema mismatch"):
        log.append(retyped)
    assert log.read().columns == ["id", "v"]
    log.append(_df(spark, 10, 20))  # same schema still fine
    assert log.read().count() == 20


def test_merge_rejects_null_keys(spark, log):
    """NULL-keyed update rows get a clear error (they can never match via
    the semi/anti joins), not a bogus duplicate-keys message."""
    log.append(_df(spark, 0, 10))
    upd = spark.sql("SELECT CAST(NULL AS BIGINT) AS id, CAST(1 AS BIGINT) AS v")
    with pytest.raises(ValueError, match="NULL in key columns"):
        log.merge(upd, ["id"])


def test_streaming_sink_per_stream_batch_ids(spark, log):
    """Two independent streaming queries sinking into one table keep
    separate exactly-once watermarks: stream B's batch 0 commits even
    after stream A committed batch 5, and each stream still skips its
    own replays (round-3 advice)."""
    sink_a = log.streaming_sink(stream_id="a")
    sink_b = log.streaming_sink(stream_id="b")
    sink_a(_df(spark, 0, 5), 5)
    assert log.read().count() == 5
    sink_b(_df(spark, 5, 8), 0)  # would be dropped under a global marker
    assert log.read().count() == 8
    sink_a(_df(spark, 0, 5), 5)  # stream A replay: skipped
    assert log.read().count() == 8
    sink_b(_df(spark, 8, 10), 0)  # stream B replay: skipped
    assert log.read().count() == 8
    assert log.last_stream_batch_id("a") == 5
    assert log.last_stream_batch_id("b") == 0
    assert log.last_stream_batch_id("missing") is None


def test_append_ignores_nested_nullability(spark, log):
    """Nested nullability flags (valueContainsNull on maps, containsNull
    on arrays) differ between logically-identical frames (from_json vs
    create_map) but are parquet-compatible — append must accept them."""
    import pyspark.sql.functions as SF

    base = spark.range(0, 3).select(
        "id", SF.from_json(SF.lit('{"k":"v"}'), "map<string,string>").alias("m")
    )
    log.append(base)
    relaxed = spark.range(3, 6).select(
        "id", SF.create_map(SF.lit("k"), SF.lit("v")).alias("m")
    )
    log.append(relaxed)  # valueContainsNull False vs True: must not raise
    assert log.read().count() == 6


def test_merge_schema_evolution_appends_column(spark, log):
    """merge_schema=True adds new columns as a metadata-only evolution:
    old files are untouched and backfill NULL on read; the evolved
    column is queryable across the whole table; a frame that OMITS
    columns is also accepted (missing -> NULL)."""
    log.append(_df(spark, 0, 10))
    old_files = {fe.path for fe in log.files()}
    wide = spark.range(10, 20).selectExpr("id", "id * 2 AS v", "id * 3 AS w")
    log.append(wide, merge_schema=True)
    assert old_files <= {fe.path for fe in log.files()}  # nothing rewritten
    got = log.read()
    assert got.columns == ["id", "v", "w"]
    assert got.count() == 20
    assert got.where("w IS NULL").count() == 10  # pre-evolution rows
    assert got.where("w = id * 3").count() == 10
    # subset append after evolution: missing columns read back NULL
    narrow = spark.range(20, 25).selectExpr("id")
    log.append(narrow, merge_schema=True)
    got = log.read()
    assert got.columns == ["id", "v", "w"]
    assert got.where("v IS NULL AND w IS NULL").count() == 5
    # time travel: pre-evolution versions keep the pre-evolution schema
    assert log.read(version=0).columns == ["id", "v"]


def test_merge_schema_still_rejects_type_changes(spark, log):
    log.append(_df(spark, 0, 10))
    retyped = spark.range(0, 5).selectExpr("CAST(id AS STRING) AS id", "id AS v")
    with pytest.raises(ValueError, match="append schema mismatch on column"):
        log.append(retyped, merge_schema=True)


def test_rewrites_preserve_evolved_schema(spark, log):
    """delete/merge/compact after an evolution must carry the evolved
    schema into the files they rewrite: their reads are pinned to the
    committed schema, so pre-evolution survivors keep NULL in the new
    column instead of dropping it (or the whole column vanishing based
    on which file Spark sampled)."""
    log.append(_df(spark, 0, 50))
    wide = spark.range(50, 60).selectExpr("id", "id * 2 AS v", "id * 3 AS w")
    log.append(wide, merge_schema=True)
    # delete hits only the OLD files; rewritten survivors must still
    # expose (id, v, w)
    log.delete_where("id < 5")
    got = log.read()
    assert got.columns == ["id", "v", "w"]
    assert got.count() == 55
    assert got.where("w IS NULL").count() == 45
    # merge with the evolved schema touches old files too
    upd = spark.range(5, 8).selectExpr("id", "id * 20 AS v", "id * 30 AS w")
    log.merge(upd, ["id"])
    got = log.read()
    assert got.where("v = id * 20 AND w = id * 30").count() == 3
    assert got.count() == 55
    # compact the mixed-vintage live set into one file
    log.compact(target_files=1)
    got = log.read()
    assert got.count() == 55
    assert got.columns == ["id", "v", "w"]
    assert got.where("w IS NULL").count() == 42  # 45 - 3 merged
    # change feed across the evolution is pinned to the newest schema
    feed = log.inserts_between(0, log.latest_version())
    assert feed.columns == ["id", "v", "w"]


def test_delete_keys_rewrites_only_hit_files(spark, log):
    """Key-list deletion (the right-to-be-forgotten path): only files
    containing a listed key rewrite; untouched files stay referenced;
    time travel still sees the erased rows until vacuum."""
    log.append(_df(spark, 0, 50))
    log.append(_df(spark, 50, 100))
    before = {fe.path for fe in log.files()}
    keys = spark.range(90, 95).selectExpr("id")  # only the 2nd batch
    log.delete_keys(keys, ["id"])
    assert log.read().count() == 95
    assert log.read().where("id IN (90,91,92,93,94)").count() == 0
    hist = log.history()[0]
    assert hist["op"] == "delete"
    after = {fe.path for fe in log.files()}
    assert before & after, "files without matches must stay referenced"
    assert log.read(version=1).count() == 100  # history intact
    # absent keys: metadata-only no-op commit
    v = log.delete_keys(spark.range(5000, 5002).selectExpr("id"), ["id"])
    assert log.history()[0]["op"] == "delete"
    assert log.read(version=v).count() == 95
    # NULL keys rejected with a clear message
    nulls = spark.sql("SELECT CAST(NULL AS BIGINT) AS id")
    with pytest.raises(ValueError, match="NULL in key columns"):
        log.delete_keys(nulls, ["id"])
    # unknown key column rejected
    with pytest.raises(ValueError, match="absent from table"):
        log.delete_keys(spark.range(3).selectExpr("id AS nope"), ["nope"])


def test_restore_rolls_back_and_preserves_history(spark, log):
    """restore(v) re-points the head at an old version's file set and
    schema as a NEW metadata-only commit: data matches the target
    version, history keeps everything (including the rollback itself),
    and a restore can be restored away."""
    log.append(_df(spark, 0, 50))          # v0
    log.append(_df(spark, 50, 100))        # v1
    log.delete_where("id < 25")            # v2
    assert log.read().count() == 75

    v = log.restore(0)                     # v3: back to the first 50 rows
    assert v == 3
    assert log.read().count() == 50
    assert sorted(r["id"] for r in log.read().collect()) == list(range(50))
    # history preserved: the pre-restore state is still readable
    assert log.read(version=2).count() == 75
    assert log.history()[0]["op"] == "restore"
    assert log.history()[0]["meta"]["restore_of"] == 0

    log.restore(2)                         # v4: restore the restore away
    assert log.read().count() == 75

    # schema rolls back too: evolve a column, then restore past it
    evolved = _df(spark, 100, 101).selectExpr("id", "v", "CAST(1 AS BIGINT) AS extra")
    log.append(evolved, merge_schema=True)  # v5
    assert "extra" in log.read().columns
    log.restore(4)                          # v6
    assert "extra" not in log.read().columns

    with pytest.raises(ValueError, match="out of range"):
        log.restore(99)


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    """A restore whose target files were already vacuumed must raise
    rather than commit dangling paths."""
    log = SnapshotLog(
        spark, str(tmp_path / "tbl"), stats_cols=("id",), checkpoint_every=100
    )
    log.append(_df(spark, 0, 10))           # v0
    for i in range(1, 8):
        log.overwrite(_df(spark, 10 * i, 10 * i + 10))
    removed = log.vacuum(retain_versions=2, min_age_s=0.0)
    assert removed  # v0's files are gone
    with pytest.raises(ValueError, match="vacuumed"):
        log.restore(0)


def test_restore_change_feed_reports_only_reintroduced_rows(spark, log):
    """The restore commit must carry only the symmetric difference:
    files live at both ends are not re-listed, so inserts_between
    across a restore reports exactly the genuinely re-introduced rows."""
    log.append(_df(spark, 0, 50))        # v0: files A
    log.append(_df(spark, 50, 60))       # v1: files B
    log.restore(0)                       # v2: drops B; A was never dropped
    assert log.inserts_between(1, 2).count() == 0
    e = log._read_entry(2)
    assert e.add == [] and len(e.remove) > 0

    log.restore(1)                       # v3: re-introduces B's rows only
    ins = log.inserts_between(2, 3)
    assert sorted(r["id"] for r in ins.collect()) == list(range(50, 60))
    assert log.read().count() == 60


def test_optimize_write_coalesces_small_appends(spark, tmp_path):
    """optimizeWrite: a small commit from a many-partition frame must
    not fragment the table (the file-count pathology the snapshot
    stress measures); a commit already larger than the target keeps
    its parallel files."""
    log = SnapshotLog(
        spark, str(tmp_path / "ow"), checkpoint_every=4,
        target_file_bytes=1 << 20,
    )
    log.append(spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(16))
    assert len(log.files()) == 1  # ~kB of data: 16 task files -> 1
    assert log.read().count() == 1000

    # a commit whose bytes exceed the target keeps multiple files:
    # lower the target below this batch's size instead of writing GBs
    log2 = SnapshotLog(
        spark, str(tmp_path / "ow2"), checkpoint_every=4,
        target_file_bytes=1,
    )
    log2.append(spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(4))
    assert len(log2.files()) == 4  # want >= written: untouched
    assert log2.read().count() == 1000

    # disabled: fragmentation preserved verbatim
    log3 = SnapshotLog(
        spark, str(tmp_path / "ow3"), checkpoint_every=4,
        target_file_bytes=0,
    )
    log3.append(spark.range(100).selectExpr("id", "id * 2 AS v").repartition(8))
    assert len(log3.files()) == 8


def test_delete_rebases_over_concurrent_append(spark, log):
    """delete_where rides the same rebasing commit as compact: a
    concurrent append's files are disjoint from the delete's hit set,
    so losing the version race rebases instead of failing — and the
    concurrently appended rows survive even when they match the
    predicate (snapshot-scope semantics, Delta WriteSerializable)."""
    log.append(_df(spark, 0, 50))
    real_publish = log._publish
    stole = {"done": False}

    def racing_publish(entry):
        if entry.op == "delete" and not stole["done"]:
            stole["done"] = True
            # concurrent append lands first — its rows ALSO match the
            # delete predicate (id >= 40) but are outside its snapshot
            log._publish = real_publish
            log.append(_df(spark, 50, 60))
            log._publish = racing_publish
        return real_publish(entry)

    log._publish = racing_publish
    log.delete_where("id >= 40")
    assert log.history()[0]["op"] == "delete"
    # snapshot rows [40,50) deleted; concurrent [50,60) append survives
    assert sorted(r["id"] for r in log.read().collect()) == list(
        range(40)
    ) + list(range(50, 60))


def test_changes_between_mirrors_table(spark, log):
    """Folding the delete-visible feed (removes then inserts, per
    version) over the v_from snapshot reconstructs the v_to snapshot
    exactly — multiset semantics, no keys needed — across a mixed
    append/delete/merge/compact window. compact emits nothing."""
    from collections import Counter

    log.append(_df(spark, 0, 50))  # v0
    log.append(_df(spark, 50, 100))  # v1
    log.delete_where("id % 3 = 0")  # v2
    log.merge(spark.range(98, 103).selectExpr("id", "id*7 AS v"), ["id"])  # v3
    log.compact(target_files=1)  # v4: row-preserving -> silent
    head = log.latest_version()
    assert head == 4

    feed = log.changes_between(0, head).collect()
    assert all(r["_change_op"] in ("insert", "remove") for r in feed)
    assert not [r for r in feed if r["_change_version"] == 4], "compact must be silent"

    state = Counter((r["id"], r["v"]) for r in log.read(version=0).collect())
    for v in range(1, head + 1):
        for r in feed:
            if r["_change_version"] == v and r["_change_op"] == "remove":
                state[(r["id"], r["v"])] -= 1
        for r in feed:
            if r["_change_version"] == v and r["_change_op"] == "insert":
                state[(r["id"], r["v"])] += 1
    state = Counter({k: n for k, n in state.items() if n})
    expect = Counter((r["id"], r["v"]) for r in log.read().collect())
    assert state == expect

    # empty window -> schema'd empty frame with the feed columns in front
    empty = log.changes_between(head, head)
    assert empty.count() == 0
    assert empty.schema.fieldNames()[:2] == ["_change_version", "_change_op"]
    with pytest.raises(ValueError, match="bad change range"):
        log.changes_between(2, head + 1)


def test_changes_between_refuses_vacuumed_window(spark, log):
    """A window whose removed files were vacuumed raises instead of
    returning a silently incomplete feed."""
    log.append(_df(spark, 0, 50))  # v0
    log.delete_where("id < 10")  # v1 rewrites v0's files
    log.compact(target_files=1)  # v2
    log.append(_df(spark, 50, 60))  # v3 (keeps head moving)
    log.vacuum(retain_versions=1, min_age_s=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        log.changes_between(0, log.latest_version()).collect()


def test_shallow_clone_forks_history(spark, log, tmp_path):
    """clone(): metadata-only fork — reads match the cloned version,
    histories diverge independently, and nothing is copied (the clone's
    v0 references the source's files by relative path)."""
    log.append(_df(spark, 0, 50))  # v0
    log.append(_df(spark, 50, 100))  # v1
    clone = log.clone(str(tmp_path / "branch"), version=0)
    assert clone.read().count() == 50  # the v0 snapshot, not head
    assert all(
        fe.path.startswith("..") for fe in clone._resolve(0)[0]
    ), "shallow clone must reference source files, not copy them"
    # independent histories
    clone.append(_df(spark, 1000, 1010))
    log.append(_df(spark, 100, 110))
    assert clone.read().count() == 60
    assert log.read().count() == 110
    assert [e["op"] for e in clone.history()][-1] == "clone"
    # a second clone into a non-empty destination refuses
    with pytest.raises(ValueError, match="not empty"):
        log.clone(str(tmp_path / "branch"))
    with pytest.raises(ValueError, match="out of range"):
        log.clone(str(tmp_path / "other"), version=99)


def test_clone_rewrites_stay_clone_local(spark, log, tmp_path):
    """delete_where on a clone rewrites the hit (source-referencing)
    files into the CLONE's data dir; the source table is untouched —
    the ../-path file targeting through _uri_to_rel must match."""
    import glob

    log.append(_df(spark, 0, 100))
    clone = log.clone(str(tmp_path / "branch"))
    src_files_before = sorted(
        glob.glob(str(tmp_path / "tbl" / "data" / "*" / "*.parquet"))
    )
    n_deleted = clone.delete_where("id < 30")
    assert n_deleted >= 1
    assert clone.read().count() == 70
    assert sorted(r["id"] for r in clone.read().collect()) == list(range(30, 100))
    # source bytes and content untouched
    assert (
        sorted(glob.glob(str(tmp_path / "tbl" / "data" / "*" / "*.parquet")))
        == src_files_before
    )
    assert log.read().count() == 100
    # clone's vacuum never reaches outside its root
    clone.vacuum(retain_versions=1, min_age_s=0.0)
    assert log.read().count() == 100


def test_source_vacuum_protects_undetached_clone(spark, log, tmp_path):
    """The Delta shallow-clone vacuum hazard, CLOSED: clone registers
    itself in the source, so source vacuum KEEPS files an un-detached
    clone still references; once the clone detaches (compact) the
    registration drops and the next vacuum reclaims them."""
    log.append(_df(spark, 0, 80))  # v0
    clone = log.clone(str(tmp_path / "branch"))
    # source rewrites everything: v0's files leave the retain window
    log.delete_where("id >= 0")
    log.append(_df(spark, 200, 210))
    removed = log.vacuum(retain_versions=1, min_age_s=0.0)
    assert clone.read().count() == 80, "clone must survive source vacuum"
    # the clone-referenced v0 files were protected, not reclaimed
    live_clone_files = {fe.path.split("/")[-1] for fe in clone._resolve(0)[0]}
    assert not any(p.split("/")[-1] in live_clone_files for p in removed)
    # detach, then vacuum again: now the v0 files are reclaimable
    clone.compact(target_files=1)
    removed2 = log.vacuum(retain_versions=1, min_age_s=0.0)
    assert any(p.split("/")[-1] in live_clone_files for p in removed2)
    assert clone.read().count() == 80  # detached clone unaffected


def test_source_vacuum_force_overrides_clone_protection(spark, log, tmp_path):
    """vacuum(force=True) is the raw Delta behavior: reclaim regardless;
    the un-detached clone's read then fails on the missing file."""
    log.append(_df(spark, 0, 40))
    clone = log.clone(str(tmp_path / "branch"))
    log.delete_where("id >= 0")
    removed = log.vacuum(retain_versions=1, min_age_s=0.0, force=True)
    assert removed, "force must reclaim clone-referenced files"
    with pytest.raises(Exception):
        clone.read().collect()


def test_deleted_clone_unregisters_automatically(spark, log, tmp_path):
    """An abandoned clone (directory deleted without detaching) stops
    pinning source storage: its registration is dropped on the next
    vacuum and the files are reclaimed."""
    import shutil as _shutil

    log.append(_df(spark, 0, 40))
    clone = log.clone(str(tmp_path / "branch"))
    _shutil.rmtree(clone.root)
    log.delete_where("id >= 0")
    removed = log.vacuum(retain_versions=1, min_age_s=0.0)
    assert removed, "deleted clone must not pin source files"
    assert log._registered_clones() == []


def test_unreachable_clone_keeps_registration_and_fails_vacuum(
    spark, log, tmp_path
):
    """A clone root that is UNREACHABLE (parent gone — the unmounted-
    share shape) is NOT the same as deleted: vacuum must refuse rather
    than silently drop the registration and reclaim files the live
    clone still references; force=True stays the explicit override,
    and the registration survives for when the mount returns
    (round-9 ADVICE, low)."""
    import shutil as _shutil

    log.append(_df(spark, 0, 40))
    mnt = tmp_path / "mnt"
    clone = log.clone(str(mnt / "branch"))
    _shutil.rmtree(str(mnt))  # simulate the whole mount vanishing
    log.delete_where("id >= 0")
    with pytest.raises(RuntimeError, match="unreachable"):
        log.vacuum(retain_versions=1, min_age_s=0.0)
    # registration intact: a restored mount regains protection
    assert log._registered_clones() == [clone.root]
    removed = log.vacuum(retain_versions=1, min_age_s=0.0, force=True)
    assert removed, "force must reclaim despite the unreachable clone"
    assert log._registered_clones() == [clone.root]


def test_unmounted_share_with_surviving_mountpoint_fails_vacuum(
    spark, log, tmp_path
):
    """The device witness (round-10 self-review): the clone's name
    absent from a SUCCESSFUL parent listing still doesn't prove
    deletion when the parent sits on a different device than at
    registration — the unmounted-share shape where the mount-point
    directory itself survives the unmount. Vacuum must refuse, keeping
    the registration for when the mount returns."""
    import json as _json
    import shutil as _shutil

    log.append(_df(spark, 0, 40))
    mnt = tmp_path / "mnt"
    clone = log.clone(str(mnt / "branch"))
    _shutil.rmtree(clone.root)  # dir gone; parent mnt survives, empty
    # simulate "mnt is a mount point whose share unmounted": the live
    # parent device no longer matches the registered witness
    with open(log._clones_path()) as f:
        reg = _json.load(f)
    reg[clone.root] = reg[clone.root] + 1
    with open(log._clones_path(), "w") as f:
        _json.dump(reg, f)
    log.delete_where("id >= 0")
    with pytest.raises(RuntimeError, match="different device"):
        log.vacuum(retain_versions=1, min_age_s=0.0)
    assert log._registered_clones() == [clone.root]


def test_legacy_registry_empty_parent_is_ambiguous(spark, log, tmp_path):
    """A legacy (list-format, no device witness) registration whose
    parent directory lists EMPTY is the unmounted-mount-point
    signature, not proof of deletion: vacuum refuses. The same legacy
    entry with a live clone is upgraded in place; with a genuinely
    deleted clone beside surviving siblings it still unregisters."""
    import json as _json
    import shutil as _shutil

    log.append(_df(spark, 0, 40))
    mnt = tmp_path / "mnt"
    clone = log.clone(str(mnt / "branch"))
    # rewrite the registry in the pre-round-10 list format
    with open(log._clones_path(), "w") as f:
        _json.dump([clone.root], f)
    _shutil.rmtree(clone.root)  # parent mnt now lists empty
    log.delete_where("id >= 0")
    with pytest.raises(RuntimeError, match="no device witness"):
        log.vacuum(retain_versions=1, min_age_s=0.0)
    assert log._registered_clones() == [clone.root]
    # a sibling entry makes the parent listing non-empty: absence of
    # the clone's name is then a confirmed deletion even without a
    # witness (the legacy unregister path still works)
    (mnt / "sibling").mkdir()
    removed = log.vacuum(retain_versions=1, min_age_s=0.0)
    assert removed and log._registered_clones() == []


def test_clone_restore_past_source_vacuum_raises_not_corrupts(
    spark, log, tmp_path
):
    """The detach-then-time-travel edge: a compacted (detached) clone
    unregisters on the next source vacuum, after which its v0 still
    names source files that are now gone. Restoring to v0 must fail
    LOUDLY at restore time (dangling-path check) — never commit a head
    that reads broken — while the clone's own head stays intact.
    Delta-consistent: vacuum bounds time travel, not liveness."""
    log.append(_df(spark, 0, 40))
    clone = log.clone(str(tmp_path / "branch"))
    clone.compact()  # the documented detach: head now all clone-owned
    log.delete_where("id >= 0")
    removed = log.vacuum(retain_versions=1, min_age_s=0.0)
    assert removed, "detached clone must not pin source files"
    assert log._registered_clones() == []
    assert clone.read().count() == 40  # head unaffected
    with pytest.raises(ValueError, match="vacuumed"):
        clone.restore(0)
    assert clone.read().count() == 40  # failed restore committed nothing


def test_clone_root_without_log_fails_vacuum(spark, log, tmp_path):
    """A registered clone root that EXISTS but holds no snapshot log is
    a torn state or an empty mount point shadowing the real clone —
    never a detach (registered clones are born with v0). Vacuum must
    refuse rather than silently unregister."""
    import os as _os
    import shutil as _shutil

    log.append(_df(spark, 0, 40))
    clone = log.clone(str(tmp_path / "branch"))
    _shutil.rmtree(clone.root)
    _os.makedirs(clone.root)  # empty dir at the registered path
    log.delete_where("id >= 0")
    with pytest.raises(RuntimeError, match="no snapshot log"):
        log.vacuum(retain_versions=1, min_age_s=0.0)
    assert log._registered_clones() == [clone.root]


def test_changes_between_across_schema_evolution(spark, log):
    """CDF window spanning a merge_schema append: the newest schema in
    range pins the output, so older-vintage rows — inserts AND removes
    — backfill NULL for the later column, and the fold still mirrors
    the table."""
    from collections import Counter

    log.append(_df(spark, 0, 30))  # v0: (id, v)
    log.append(  # v1: adds column w
        spark.range(30, 40).selectExpr("id", "id * 2 AS v", "id * 10 AS w"),
        merge_schema=True,
    )
    log.delete_where("id < 5")  # v2: rewrites a v0-vintage file
    head = log.latest_version()
    feed = log.changes_between(0, head).collect()
    assert "w" in feed[0].asDict()
    # every row read from a v0-vintage file backfills w with NULL —
    # the REMOVE side of v2 included (the pin this test adds)
    v2_removes = [
        r for r in feed if r["_change_version"] == 2 and r["_change_op"] == "remove"
    ]
    assert v2_removes and all(r["w"] is None for r in v2_removes)
    v1_inserts = [
        r for r in feed if r["_change_version"] == 1 and r["_change_op"] == "insert"
    ]
    assert v1_inserts and all(r["w"] == r["id"] * 10 for r in v1_inserts)
    # fold mirrors the table across the evolution
    state = Counter(
        (r["id"], r["v"], None) for r in log.read(version=0).collect()
    )
    for ver in range(1, head + 1):
        for r in feed:
            if r["_change_version"] == ver:
                delta = -1 if r["_change_op"] == "remove" else 1
                state[(r["id"], r["v"], r["w"])] += delta
    state = Counter({k: n for k, n in state.items() if n})
    expect = Counter((r["id"], r["v"], r["w"]) for r in log.read().collect())
    assert state == expect


def test_clone_compact_detaches_from_source(spark, log, tmp_path):
    """compact() on a clone rewrites live rows into clone-owned files
    (no ../ references remain) — after that the source can vacuum
    freely without breaking the clone."""
    log.append(_df(spark, 0, 80))
    clone = log.clone(str(tmp_path / "branch"))
    clone.compact(target_files=1)
    live, _ = clone._resolve(clone.latest_version())
    assert live and not any(fe.path.startswith("..") for fe in live)
    # source rewrites all data (delete everything) then vacuums
    log.delete_where("id >= 0")
    log.vacuum(retain_versions=1, min_age_s=0.0)
    assert clone.read().count() == 80  # detached clone unaffected
    # stats-pruned reads still work on the clone
    assert clone.read(bounds={"id": (0, 9)}).count() >= 10


class TestDeletionVectors:
    def test_dv_delete_semantics_and_zero_rewrites(self, spark, log, tmp_path):
        """mode='dv': visible semantics identical to the rewrite delete,
        but not a byte of the base files changes; vectors stack
        cumulatively; time travel sees pre-delete rows; history records
        the mode and the deleted-row count."""
        import glob

        log.append(_df(spark, 0, 100))
        twin = SnapshotLog(spark, str(tmp_path / "twin"))
        twin.append(_df(spark, 0, 100))

        base_files = sorted(glob.glob(str(tmp_path / "tbl/data/b-*/*.parquet")))
        mtimes = {p: os.path.getmtime(p) for p in base_files}
        log.delete_where("id % 10 = 3", mode="dv")
        twin.delete_where("id % 10 = 3")  # rewrite twin
        assert sorted(r["id"] for r in log.read().collect()) == sorted(
            r["id"] for r in twin.read().collect()
        )
        assert sorted(glob.glob(str(tmp_path / "tbl/data/b-*/*.parquet"))) == base_files
        assert {p: os.path.getmtime(p) for p in base_files} == mtimes
        # vectors stack: second dv delete unions positions
        log.delete_where("id % 10 = 7", mode="dv")
        assert log.read().count() == 80
        assert log.read().where("id in (3, 7, 13, 17)").count() == 0
        assert log.read(version=0).count() == 100  # time travel intact
        h = log.history()[0]
        assert h["op"] == "delete"
        assert log._read_entry(log.latest_version()).meta["mode"] == "dv"
        assert log._read_entry(log.latest_version()).meta["deleted_rows"] == 10
        with pytest.raises(ValueError, match="mode"):
            log.delete_where("id = 1", mode="bogus")

    def test_dv_materializes_on_rewrite_compact_and_restore(self, spark, log):
        """A rewrite-mode delete or compact over DV'd files folds the
        vectors into plain files; restore past a DV delete resurrects
        the rows (the (path, dv)-keyed symmetric difference)."""
        log.append(_df(spark, 0, 60))
        log.delete_where("id % 3 = 0", mode="dv")  # v1: 40 live
        v1 = log.latest_version()
        log.delete_where("id >= 50")  # v2 rewrite touches DV'd files
        assert log.read().count() == 33  # 40 - ids 50..59 alive (7 dv'd)
        assert log.read().where("id % 3 = 0").count() == 0
        log.compact(target_files=1)
        assert not any(fe.dv for fe in log.files()), "compact materializes DVs"
        assert log.read().count() == 33
        # restore to v0: the DV delete must unwind even though the base
        # file paths never changed
        log.restore(0)
        assert log.read().count() == 60
        log.restore(v1)
        assert log.read().count() == 40

    def test_dv_cdf_fold_and_vacuum(self, spark, log, tmp_path):
        """changes_between folds correctly across DV deletes (remove =
        old live rows, insert = new live view of the same path), and
        vacuum reclaims dead DV sidecars while protecting live ones."""
        from collections import Counter

        log.append(_df(spark, 0, 40))
        log.delete_where("id % 4 = 1", mode="dv")  # v1
        log.delete_where("id % 4 = 2", mode="dv")  # v2 (stacks)
        head = log.latest_version()
        feed = log.changes_between(0, head).collect()
        state = Counter((r["id"], r["v"]) for r in log.read(version=0).collect())
        for ver in range(1, head + 1):
            for r in feed:
                if r["_change_version"] == ver and r["_change_op"] == "remove":
                    state[(r["id"], r["v"])] -= 1
            for r in feed:
                if r["_change_version"] == ver and r["_change_op"] == "insert":
                    state[(r["id"], r["v"])] += 1
        state = Counter({k: n for k, n in state.items() if n})
        assert state == Counter(
            (r["id"], r["v"]) for r in log.read().collect()
        )
        # v1's superseded DV dir is reclaimable; v2's live one is not
        import glob

        dv_dirs = sorted(glob.glob(str(tmp_path / "tbl/data/dv-*")))
        assert len(dv_dirs) == 2
        removed = log.vacuum(retain_versions=1, min_age_s=0.0)
        assert any("dv-" in p for p in removed), "dead DV sidecar reclaimed"
        assert log.read().count() == 20
        live_dv = {fe.dv for fe in log.files() if fe.dv}
        assert live_dv and all(
            os.path.exists(os.path.join(log.root, d)) for d in live_dv
        )

    def test_delete_keys_dv_tombstone_batch(self, spark, log, tmp_path):
        """delete_keys(mode='dv'): the tombstone-batch erasure path —
        scattered keys vanish from every read without rewriting a
        file; a follow-up compact scrubs the physical bytes (the
        two-phase strict-erasure contract)."""
        import glob

        log.append(_df(spark, 0, 100))
        base_files = sorted(glob.glob(str(tmp_path / "tbl/data/b-*/*.parquet")))
        kills = spark.createDataFrame([(7,), (23,), (64,), (999,)], "id long")
        log.delete_keys(kills, ["id"], mode="dv")
        assert log.read().count() == 97
        assert log.read().where("id in (7, 23, 64)").count() == 0
        assert sorted(glob.glob(str(tmp_path / "tbl/data/b-*/*.parquet"))) == base_files
        e = log._read_entry(log.latest_version())
        assert e.meta["mode"] == "dv" and e.meta["deleted_rows"] == 3
        # stacks on top of a prior DV delete
        log.delete_where("id >= 90", mode="dv")
        assert log.read().count() == 87
        log.compact(target_files=1)
        assert log.read().count() == 87 and not any(fe.dv for fe in log.files())
        with pytest.raises(ValueError, match="mode"):
            log.delete_keys(kills, ["id"], mode="nope")

    def test_dv_batched_read_shape_equivalence(self, spark, log, tmp_path, monkeypatch):
        """The batched DV read (one scan + path-keyed anti-join, used
        above _DV_BATCH_THRESHOLD DV'd files) returns exactly what the
        per-file shape returns — on the source table, through a
        rewrite-delete probe, AND on a shallow clone whose ../-entries
        must normalize to the same absolute join key."""
        import nibbledb_spark.snapshots as snap

        log.append(_df(spark, 0, 100))
        log.delete_where("id % 10 = 3", mode="dv")
        clone = log.clone(str(tmp_path / "branch"))
        want = sorted(r["id"] for r in log.read().collect())
        monkeypatch.setattr(snap, "_DV_BATCH_THRESHOLD", 0)
        assert sorted(r["id"] for r in log.read().collect()) == want
        assert sorted(r["id"] for r in clone.read().collect()) == want
        # a rewrite delete's probe + survivor rewrite through the
        # batched view stays correct too
        log.delete_where("id >= 90")
        assert sorted(r["id"] for r in log.read().collect()) == [
            i for i in range(90) if i % 10 != 3
        ]
        # CDF remove/insert sides also flow through the batched reader
        assert log.changes_between(0, 1).count() > 0

    def test_dv_batched_read_exotic_root_falls_back(
        self, spark, tmp_path, monkeypatch
    ):
        """A table root Hadoop would percent-encode (space / '%' / '#')
        must NOT use the string-path-keyed batched DV shape: the JVM's
        _metadata.file_path comes back encoded ('%20'...), the join key
        never matches, and every DV-deleted row silently resurfaces.
        The reader detects the non-quote-clean path and forces the
        per-file position-only shape, so reads stay correct at any DV
        count (round-9 ADVICE, medium)."""
        import nibbledb_spark.snapshots as snap
        from nibbledb_spark.snapshots import SnapshotLog

        root = tmp_path / "ex otic %25#tbl"
        log = SnapshotLog(spark, str(root), stats_cols=("id",))
        log.append(_df(spark, 0, 100))
        log.delete_where("id % 10 = 3", mode="dv")
        want = [i for i in range(100) if i % 10 != 3]
        assert sorted(r["id"] for r in log.read().collect()) == want
        # force the regime where the batched branch WOULD be taken
        monkeypatch.setattr(snap, "_DV_BATCH_THRESHOLD", 0)
        assert sorted(r["id"] for r in log.read().collect()) == want
        # stacking a second vector on the exotic root stays correct too
        log.delete_where("id >= 90", mode="dv")
        assert sorted(r["id"] for r in log.read().collect()) == [
            i for i in range(90) if i % 10 != 3
        ]

    def test_dv_delete_rebases_over_concurrent_append(self, spark, log):
        """A DV delete rides the same rebasing commit as rewrite
        deletes: a concurrent append only adds files, so losing the
        version race rebases — and the concurrently appended rows
        survive even when they match the predicate (snapshot-scope
        WriteSerializable, same contract as the rewrite path)."""
        log.append(_df(spark, 0, 50))
        real_publish = log._publish
        stole = {"done": False}

        def racing_publish(entry):
            if entry.op == "delete" and not stole["done"]:
                stole["done"] = True
                log._publish = real_publish
                log.append(_df(spark, 50, 60))  # rows also match id >= 40
                log._publish = racing_publish
            return real_publish(entry)

        log._publish = racing_publish
        log.delete_where("id >= 40", mode="dv")
        assert log.history()[0]["op"] == "delete"
        assert sorted(r["id"] for r in log.read().collect()) == list(
            range(40)
        ) + list(range(50, 60))

    def test_dv_cdf_refuses_vacuumed_sidecar_window(self, spark, log):
        """A CDF window whose DV sidecars were vacuumed raises instead
        of silently reading the base files un-filtered (which would
        resurrect deleted rows in the feed)."""
        log.append(_df(spark, 0, 40))
        log.delete_where("id < 5", mode="dv")  # v1: sidecar A
        log.delete_where("id < 10", mode="dv")  # v2: sidecar B supersedes A
        log.compact(target_files=1)  # v3: materializes; B now stale too
        log.append(_df(spark, 100, 110))  # v4
        log.vacuum(retain_versions=1, min_age_s=0.0)
        with pytest.raises(ValueError, match="vacuumed"):
            log.changes_between(0, log.latest_version()).collect()
        # a window past the vacuum horizon still works
        assert log.changes_between(3, 4).count() == 10

    def test_dv_clone_and_source_vacuum_protection(self, spark, log, tmp_path):
        """A shallow clone of a DV'd table reads the DV-filtered view,
        and source vacuum protects the clone-referenced DV sidecars."""
        log.append(_df(spark, 0, 50))
        log.delete_where("id < 10", mode="dv")
        clone = log.clone(str(tmp_path / "branch"))
        assert clone.read().count() == 40
        # source moves on and vacuums; the clone (and its dv ref) survive
        log.delete_where("id >= 0")
        log.append(_df(spark, 500, 505))
        log.vacuum(retain_versions=1, min_age_s=0.0)
        assert clone.read().count() == 40
        assert sorted(r["id"] for r in clone.read().collect()) == list(range(10, 50))
