"""TimeSeriesEngine store tests: ingest round-trip, bucket pruning,
delete rewrite, compaction invariance, index manifest."""

from __future__ import annotations

import pytest

from nibbledb_spark.schema import ValidationError
from tests.conftest import BUTTERFLIES, HONEYBEES

WIRE_BUTTERFLIES = [
    {"timestamp": t, "tag": [{k: v} for k, v in tag.items()], "value": v_}
    for (_, t, tag, v_) in BUTTERFLIES
]


def test_write_read_roundtrip(engine):
    n = engine.write("butterflies", WIRE_BUTTERFLIES)
    assert n == 8
    assert engine.length(["butterflies"]) == 8
    got = engine.last(["butterflies"], 2).collect()
    assert [r["value"] for r in got] == [7.0, 8.0]
    assert got[0]["tag"]["scientist"] == "perpetua"


def test_single_point_and_server_ts(engine):
    engine.write("s1", {"value": 42})
    row = engine.latest(["s1"]).collect()[0]
    assert row["value"] == 42.0
    assert row["ts"] > 1_700_000_000_000_000  # server-assigned µs epoch


def test_strict_mode_rejects_reordered_fields(spark, tmp_path):
    from nibbledb_spark.engine import TimeSeriesEngine

    eng = TimeSeriesEngine(spark, str(tmp_path / "s"), strict_ingest=True)
    with pytest.raises(ValidationError):  # Q3: {value, timestamp} order rejected
        eng.write("s", {"value": 1, "timestamp": 1439856000000000})
    eng.write("s", {"timestamp": 1439856000000000, "value": 1})  # canonical order ok


def test_lenient_mode_accepts_any_order(engine):
    engine.write("s", {"value": 1, "timestamp": 1439856000000000})
    assert engine.length(["s"]) == 1


def test_unknown_key_rejected(engine):
    with pytest.raises(ValidationError):
        engine.write("s", {"value": 1, "bogus": 2})


def test_multi_series_isolation_and_names(engine):
    engine.write("butterflies", WIRE_BUTTERFLIES)
    engine.write("honeybees", [{"timestamp": t, "value": v} for (_, t, _, v) in HONEYBEES])
    assert engine.names() == ["butterflies", "honeybees"]
    assert engine.length(["butterflies"]) == 8
    assert engine.length(["butterflies", "honeybees"]) == 16
    assert engine.length() == 16
    st = {r["series"]: r["length"] for r in engine.stats().collect()}
    assert st == {"butterflies": 8, "honeybees": 8}


def test_no_dedup_on_reingest(engine):
    # Q6: re-POSTing duplicates
    engine.write("s", [{"timestamp": 1, "value": 5}])
    engine.write("s", [{"timestamp": 1, "value": 5}])
    assert engine.length(["s"]) == 2


def test_delete_range_precise(engine):
    engine.write("butterflies", WIRE_BUTTERFLIES)
    engine.delete(["butterflies"], 1439856000000000, 1439856360000000)
    assert engine.length(["butterflies"]) == 4
    remaining = {r["ts"] for r in engine.points(["butterflies"]).collect()}
    assert min(remaining) > 1439856360000000


def test_delete_tag_filtered_vs_compat(engine):
    engine.write("butterflies", WIRE_BUTTERFLIES)
    # precise: only perpetua points at T0 go
    engine.delete(
        ["butterflies"],
        1439856000000000,
        1439856000000000,
        tag_names=["scientist"],
        tag_values=["perpetua"],
    )
    assert engine.length(["butterflies"]) == 7


def test_delete_compat_membership(engine):
    engine.write("butterflies", WIRE_BUTTERFLIES)
    engine.delete(
        ["butterflies"],
        1439856000000000,
        1439856000000000,
        tag_names=["scientist"],
        tag_values=["perpetua"],
        compat_membership=True,
    )
    # Q2: the same-ts langstroth point dies too
    assert engine.length(["butterflies"]) == 6


def test_delete_does_not_touch_other_series(engine):
    engine.write("butterflies", WIRE_BUTTERFLIES)
    engine.write("honeybees", [{"timestamp": t, "value": v} for (_, t, _, v) in HONEYBEES])
    engine.delete(["butterflies"], 0)
    assert engine.length(["butterflies"]) == 0
    assert engine.length(["honeybees"]) == 8


def test_compaction_invariance(engine):
    engine.write("butterflies", WIRE_BUTTERFLIES[:4])
    engine.write("butterflies", WIRE_BUTTERFLIES[4:])
    before = sorted(
        (r["series"], r["ts"], r["value"]) for r in engine.points().collect()
    )
    engine.compact()
    after = sorted(
        (r["series"], r["ts"], r["value"]) for r in engine.points().collect()
    )
    assert before == after


def test_index_manifest(engine):
    engine.write("butterflies", WIRE_BUTTERFLIES)
    idx = engine.index(["butterflies"]).collect()
    assert engine.index_length(["butterflies"]) == len(idx)
    assert sum(r["n"] for r in idx) == 8
    assert min(r["t_min"] for r in idx) == 1439856000000000
    assert max(r["t_max"] for r in idx) == 1439878320000000


def test_compaction_file_sizing(spark, engine):
    """Appends create one file per bucket per write; compact() merges
    them, and files_per_bucket>1 splits deterministically by series hash
    (file-size bound at scale) — results invariant throughout."""
    import glob

    for i in range(4):  # 4 small appends
        engine.write("butterflies", WIRE_BUTTERFLIES[2 * i : 2 * i + 2])
    engine.write("honeybees", [{"timestamp": t, "value": v} for (_, t, _, v) in HONEYBEES])

    def n_files():
        return len(glob.glob(f"{engine.path}/bucket=*/day=*/part-*.parquet"))

    before_rows = sorted(
        (r["series"], r["ts"], r["value"]) for r in engine.points().collect()
    )
    many = n_files()
    engine.compact()
    assert n_files() < many  # small files merged (one per live bucket)
    engine.compact(files_per_bucket=2)
    assert sorted(
        (r["series"], r["ts"], r["value"]) for r in engine.points().collect()
    ) == before_rows


def test_store_bucket_count_is_sticky(spark, tmp_path):
    """Reopening a store with a different num_buckets must not silently
    prune the wrong buckets: the store's own metadata wins."""
    from nibbledb_spark.engine import TimeSeriesEngine

    path = str(tmp_path / "sticky")
    eng = TimeSeriesEngine(spark, path, num_buckets=8)
    eng.write("butterflies", WIRE_BUTTERFLIES)

    reopened = TimeSeriesEngine(spark, path, num_buckets=32)  # wrong arg
    assert reopened.num_buckets == 8  # metadata overrides
    assert reopened.length(["butterflies"]) == 8
    assert reopened.last(["butterflies"], 1).count() == 1


def test_staged_swap_crash_recovery(spark, tmp_path):
    """A crash between the two renames of the staged bucket swap parks
    the live bucket dir in trash. Engine construction must rename it
    back (the interrupted delete simply never happened) and clear the
    staging/trash remnants."""
    import os
    import shutil

    from nibbledb_spark.engine import TimeSeriesEngine

    store = str(tmp_path / "store")
    eng = TimeSeriesEngine(spark, store, num_buckets=4)
    eng.write("crashy", [{"timestamp": 1000 + i, "value": float(i)} for i in range(8)])
    before = eng.length(["crashy"])
    assert before == 8

    # simulate the torn state: live bucket dir moved to trash, staging
    # left behind, live dir gone
    b = eng._bucket_py("crashy")
    live = os.path.join(store, f"bucket={b}")
    trash = eng._trash_dir()
    os.makedirs(trash, exist_ok=True)
    shutil.move(live, os.path.join(trash, f"bucket={b}"))
    os.makedirs(eng._staging_dir(), exist_ok=True)
    assert not os.path.exists(live)  # the torn state is real

    healed = TimeSeriesEngine(spark, store)
    assert healed.length(["crashy"]) == before
    assert not os.path.exists(eng._trash_dir())
    assert not os.path.exists(eng._staging_dir())


def test_staged_swap_leaves_no_remnants(spark, tmp_path):
    """Successful delete/compact leaves no staging or trash dirs."""
    import os

    from nibbledb_spark.engine import TimeSeriesEngine

    store = str(tmp_path / "store")
    eng = TimeSeriesEngine(spark, store, num_buckets=4)
    eng.write("s1", [{"timestamp": 1000 + i, "value": float(i)} for i in range(6)])
    eng.write("s2", [{"timestamp": 2000 + i, "value": float(i)} for i in range(6)])
    eng.delete(["s1"], 1000, 1002)
    assert eng.length(["s1"]) == 3 and eng.length(["s2"]) == 6
    eng.compact()
    assert eng.length(["s1"]) == 3 and eng.length(["s2"]) == 6
    assert not os.path.exists(eng._staging_dir())
    assert not os.path.exists(eng._trash_dir())


# ---------------------------------------------------------------------------
# continuous-aggregate rollup (hypertable-rollup analogue)
# ---------------------------------------------------------------------------


def _recompute_rollup(eng):
    """Ground truth: full aggregate over the raw points, same scaled-long
    arithmetic as the maintained rollup."""
    from pyspark.sql import functions as F

    every = eng.rollup_every_us
    pts = eng.points()
    s = F.sum(F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long"))
    return {
        (r["series"], r["bucket_us"]): (
            r["n"], r["value_sum"], r["value_min"], r["value_max"], r["value_mean"]
        )
        for r in pts.groupBy(
            "series", (F.col("ts") - F.pmod(F.col("ts"), F.lit(every))).alias("bucket_us")
        )
        .agg(
            F.count("*").alias("n"),
            (s.cast("double") / 1e6).alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            (s.cast("double") / 1e6 / F.count("*")).alias("value_mean"),
        )
        .collect()
    }


def _rollup_dict(eng, **kw):
    return {
        (r["series"], r["bucket_us"]): (
            r["n"], r["value_sum"], r["value_min"], r["value_max"], r["value_mean"]
        )
        for r in eng.rollup(**kw).collect()
    }


def test_rollup_incremental_equals_recompute(spark, tmp_path):
    """The write-time-maintained rollup must be BIT-IDENTICAL to a full
    recompute after multiple appends, after delete (rebuild), and after
    compact (consolidation) — scaled-long partials make merge order
    irrelevant."""
    from nibbledb_spark.engine import DAY_US, TimeSeriesEngine
    from nibbledb_spark.schema import POINT_SCHEMA

    eng = TimeSeriesEngine(spark, str(tmp_path / "store"), num_buckets=2)
    eng.enable_rollup(3_600_000_000)  # 1h buckets
    t0 = 1_439_856_000_000_000
    for batch in range(3):
        rows = [
            (f"s{i}", t0 + batch * DAY_US + j * 600_000_000, None, float(i + j) / 7)
            for i in range(3)
            for j in range(20)
        ]
        eng.append_points(spark.createDataFrame(rows, POINT_SCHEMA))
    assert _rollup_dict(eng) == _recompute_rollup(eng)

    # filtered read: only s1's buckets inside the window
    win = _rollup_dict(eng, ids=["s1"], ts_from=t0 + DAY_US, ts_to=t0 + 2 * DAY_US)
    assert win and all(k[0] == "s1" for k in win)
    full = _recompute_rollup(eng)
    assert all(full[k] == v for k, v in win.items())

    eng.delete(["s1"], t0, t0 + DAY_US)  # forces the derived-table rebuild
    assert _rollup_dict(eng) == _recompute_rollup(eng)

    eng.compact()  # consolidates delta rows to one per (series, bucket)
    assert _rollup_dict(eng) == _recompute_rollup(eng)
    rdir = eng._rollup_dir(eng.rollup_every_us)
    import glob as g
    n_files = len(g.glob(rdir + "/part-*.parquet"))
    df = spark.read.parquet(rdir)
    assert df.count() == df.select("series", "bucket_us").distinct().count()

    # rollup is derived data: losing the dir is repaired on next read
    import shutil
    shutil.rmtree(rdir)
    assert _rollup_dict(eng) == _recompute_rollup(eng)

    # the width survives reopen via store meta
    eng2 = TimeSeriesEngine(spark, str(tmp_path / "store"))
    assert eng2.rollup_every_us == 3_600_000_000
    assert _rollup_dict(eng2) == _recompute_rollup(eng2)


def test_aggregate_range_routes_to_rollup_when_aligned(spark, tmp_path):
    """Materialized-view routing: a bucket-aligned range aggregate is
    answered from the rollup (and matches the raw scan); unaligned
    windows, non-mergeable aggs, and rollup-disabled stores fall back."""
    from nibbledb_spark.engine import TimeSeriesEngine
    from nibbledb_spark.schema import POINT_SCHEMA

    H = 3_600_000_000
    t0 = 1_439_856_000_000_000  # hour-aligned
    eng = TimeSeriesEngine(spark, str(tmp_path / "store"), num_buckets=2)
    eng.enable_rollup(H)
    rows = [
        ("a", t0 + j * 600_000_000, None, float(j % 8) * 0.25) for j in range(36)
    ] + [("b", t0 + j * 600_000_000, None, 2.0) for j in range(36)]
    eng.append_points(spark.createDataFrame(rows, POINT_SCHEMA))

    aligned = (t0 + H, t0 + 4 * H - 1)
    for agg in ("sum", "count", "min", "max", "mean"):
        got = eng.aggregate_range(["a"], *aligned, agg)
        assert eng._last_agg_source == "rollup", agg
        want = eng.aggregate(["a"], agg, eng.range(["a"], *aligned))
        assert got == want, (agg, got, want)

    # unaligned window falls back to the raw scan and still matches
    got = eng.aggregate_range(["a"], t0 + H, t0 + 4 * H, "sum")
    assert eng._last_agg_source == "points"
    assert got == eng.aggregate(["a"], "sum", eng.range(["a"], t0 + H, t0 + 4 * H))

    # non-mergeable aggregate always scans raw
    eng.aggregate_range(["a"], *aligned, "median")
    assert eng._last_agg_source == "points"

    # empty routed selection keeps the A24 shaping
    assert eng.aggregate_range(["zz"], *aligned, "sum") == {"sum": 0.0}
    assert eng.aggregate_range(["zz"], *aligned, "mean") == {}
    assert eng._last_agg_source == "rollup"


def test_multi_width_rollup_hierarchy_and_routing(spark, tmp_path):
    """Hour + day rollups coexist; each width matches its recompute, and
    range-aggregate routing picks the COARSEST aligned width (day for a
    day-aligned window, hour for an hour-but-not-day-aligned one)."""
    from nibbledb_spark.engine import DAY_US, TimeSeriesEngine
    from nibbledb_spark.schema import POINT_SCHEMA

    H = 3_600_000_000
    t0 = 1_439_856_000_000_000  # day-aligned
    eng = TimeSeriesEngine(spark, str(tmp_path / "store"), num_buckets=2)
    eng.enable_rollup(H)
    eng.enable_rollup(DAY_US)
    rows = [
        ("a", t0 + j * 1_800_000_000, None, float(j % 5)) for j in range(96)
    ]  # 2 days at 30min cadence
    eng.append_points(spark.createDataFrame(rows, POINT_SCHEMA))

    hourly = eng.rollup(every_us=H).collect()
    daily = eng.rollup(every_us=DAY_US).collect()
    assert len(hourly) == 48 and len(daily) == 2
    assert sum(r["n"] for r in hourly) == sum(r["n"] for r in daily) == 96

    got = eng.aggregate_range(["a"], t0, t0 + 2 * DAY_US - 1, "sum")
    assert eng._last_agg_width == DAY_US
    got_h = eng.aggregate_range(["a"], t0 + H, t0 + 5 * H - 1, "sum")
    assert eng._last_agg_width == H
    raw = eng.aggregate(["a"], "sum", eng.range(["a"], t0 + H, t0 + 5 * H - 1))
    assert got_h == raw
    assert got == eng.aggregate(["a"], "sum", eng.range(["a"], t0, t0 + 2 * DAY_US - 1))

    # widths survive reopen
    eng2 = TimeSeriesEngine(spark, str(tmp_path / "store"))
    assert eng2.rollup_widths == [H, DAY_US]


def test_retention_drops_raw_keeps_rollup_aggregates(spark, tmp_path):
    """apply_retention (the drop_chunks + continuous-aggregate
    lifecycle): raw points below the cutoff disappear from every raw
    read, while bucket-aligned range aggregates over the dropped range
    keep answering EXACTLY from the rollup; the floor survives reopen;
    later deletes/compactions/rebuilds never lose the pre-floor
    aggregates (they are primary data now); the guard rails (no
    rollup, misaligned cutoff, backwards floor, lost rollup dir,
    enabling a new width post-retention) all refuse loudly."""
    import os
    import shutil

    import pytest

    from nibbledb_spark.engine import TimeSeriesEngine
    from nibbledb_spark.schema import POINT_SCHEMA

    HOUR = 3_600_000_000
    eng = TimeSeriesEngine(spark, str(tmp_path / "store"), num_buckets=2)
    rows = [
        (f"s{i}", h * HOUR + j * 600_000_000, None, float(i * 100 + h * 10 + j))
        for i in range(2)
        for h in range(4)
        for j in range(6)
    ]
    eng.append_points(spark.createDataFrame(rows, POINT_SCHEMA))

    with pytest.raises(ValueError, match="rollup"):
        eng.apply_retention(2 * HOUR)  # no rollup enabled yet

    eng.enable_rollup(HOUR)
    ids = ["s0", "s1"]
    pre_sum = eng.aggregate_range(ids, 0, 2 * HOUR - 1, "sum")
    pre_mean = eng.aggregate_range(ids, 0, 2 * HOUR - 1, "mean")
    pre_cnt = eng.aggregate_range(ids, 0, 2 * HOUR - 1, "count")
    n_total = eng.length(ids)

    with pytest.raises(ValueError, match="aligned"):
        eng.apply_retention(2 * HOUR + 5)

    eng.apply_retention(2 * HOUR)

    # raw reads only see the live range
    assert eng.length(ids) == n_total // 2
    assert eng.earliest(ids).collect()[0]["ts"] == 2 * HOUR
    assert eng.range(ids, 0, 2 * HOUR - 1).count() == 0

    # dropped-range aggregates still answer, exactly, from the rollup
    for agg, pre in (("sum", pre_sum), ("mean", pre_mean), ("count", pre_cnt)):
        assert eng.aggregate_range(ids, 0, 2 * HOUR - 1, agg) == pre
        assert eng._last_agg_source == "rollup"

    # floor survives reopen
    eng2 = TimeSeriesEngine(spark, str(tmp_path / "store"))
    assert eng2.retention_floor_us == 2 * HOUR
    assert eng2.aggregate_range(ids, 0, 2 * HOUR - 1, "sum") == pre_sum

    # a live-range delete triggers a rebuild — pre-floor rows must survive
    eng.delete(["s0"], 3 * HOUR, 4 * HOUR)
    assert eng.aggregate_range(ids, 0, 2 * HOUR - 1, "sum") == pre_sum
    eng.compact()
    assert eng.aggregate_range(ids, 0, 2 * HOUR - 1, "sum") == pre_sum

    # monotone floor; post-retention new widths refuse (nothing to
    # rebuild the dropped range from)
    with pytest.raises(ValueError, match="backwards"):
        eng.apply_retention(HOUR)
    with pytest.raises(ValueError, match="primary data"):
        eng.enable_rollup(2 * HOUR)

    # a raw fallback into the dropped range must refuse, not silently
    # aggregate over absent rows (round-11 review find): unaligned
    # window / non-mergeable agg below the floor both raise
    with pytest.raises(ValueError, match="retention floor"):
        eng.aggregate_range(ids, 0, 2 * HOUR - 2, "sum")  # unaligned end
    with pytest.raises(ValueError, match="retention floor"):
        eng.aggregate_range(ids, 0, 2 * HOUR - 1, "median")  # unmergeable
    # ...but live-range raw fallbacks still work
    assert eng.aggregate_range(ids, 2 * HOUR, 3 * HOUR - 2, "median")

    # a lost rollup dir is no longer self-healing: it held primary data
    shutil.rmtree(eng._rollup_dir(HOUR))
    with pytest.raises(ValueError, match="primary data"):
        eng.rollup_rebuild(HOUR)
    assert not os.path.exists(eng._rollup_dir(HOUR))
