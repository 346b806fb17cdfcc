"""The driver contract must work under a PLAIN SparkSession — the
driver's harness builds its own session without session.py's configs
(UTC, nanosAsLong). run_spark pins those at query time."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import __spark_entry__ as e

spark = (SparkSession.builder.master("local[4]")
         .appName("plain-driver")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
assert df.count() >= 0 and df.columns, "entry failed"

qs, osql = e.queries(), e.oracle_sql()
assert set(osql) <= set(qs)
# the queries most sensitive to missing session confs:
for name in ["events_hourly_windows",      # ns timestamps + TZ
             "events_sessionize_gap",      # ns epoch arithmetic
             "scalar_date_funcs",          # date_trunc in session TZ
             "q1_pricing_summary"]:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, name
print("PLAIN_SESSION_OK")
"""


def test_contract_under_plain_session():
    """Run in a subprocess so the plain session cannot inherit the test
    suite's configured SparkSession (one JVM per process)."""
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert "PLAIN_SESSION_OK" in out.stdout, out.stderr[-2000:]
