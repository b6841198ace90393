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
