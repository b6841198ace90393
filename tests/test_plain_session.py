"""Every declared query must run in a PLAIN SparkSession — the driver's
session, not ours (VERDICT.md round-1 root cause: builder-only confs).

The in-process pytest session is built by get_spark() with engine confs,
so a genuine plain-session check needs a fresh JVM: run the harness's
``--plain`` mode as a subprocess at sf0.001. Exec-only (run + collect):
value parity against DuckDB is covered by the oracle harness / driver.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

HARNESS = os.path.join(os.path.dirname(__file__), "oracle_harness.py")
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_all_queries_run_in_plain_session():
    env = dict(os.environ, ORACLE_SF_DIR=SF_DIR)
    # neutralize anything that would leak engine confs into the child
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    proc = subprocess.run(
        [sys.executable, HARNESS, "--plain", "--exec-only"],
        capture_output=True,
        text=True,
        timeout=570,
        env=env,
        cwd="/root/repo",
    )
    tail = "\n".join(proc.stdout.splitlines()[-10:])
    assert proc.returncode == 0, f"plain-session harness failed:\n{tail}\n{proc.stderr[-2000:]}"
    fails = [l for l in proc.stdout.splitlines() if l.startswith("FAIL")]
    assert not fails, f"plain-session failures: {fails}"


_DRIVER_REPLICA = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

import __spark_entry__ as e

spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver_replica")
    .getOrCreate()
)
try:
    # the driver's smoke check: entry() runs and yields >= 0 rows
    rows = e.entry(spark).collect()
    assert rows is not None
    q = e.queries()
    o = e.oracle_sql()
    names = list(q)
    # slot 0 (the canary) plus the first front query, exactly as the
    # driver would evaluate them: call, collect, count
    for name in names[:2]:
        assert name in o, f"{name} missing oracle"
        got = q[name](spark, "%(sf)s").collect()
        assert len(got) >= 0
    print("DRIVER_REPLICA_OK", names[0], names[1])
finally:
    spark.stop()
""" % {"sf": SF_DIR}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_driver_entry_sequence_replica():
    """Replicate the driver's exact entry sequence in a fresh bare JVM:
    import __spark_entry__, build a plain session, smoke entry(), then
    run slot-0 (canary) and slot-1 of the rotation (round-12 verdict
    task 1c — proves the driver contract each round, so an empty
    CORRECTNESS file indicts the driver environment, not the repo)."""
    env = dict(os.environ)
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_REPLICA],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRIVER_REPLICA_OK" in proc.stdout, proc.stdout[-1000:]
