"""Fixture-table loader / view registry.

Loads the driver's TPC-H-ish parquet tables (/root/repo/TESTDATA.md) with
declared-schema discipline and registers temp views so both the
DataFrame and SQL surfaces see the same relations (reference analogue:
Glue catalog database + tables, cdk_stacks/firehose_to_iceberg.py:80-82).

One normalization: ``events.ts`` is TIMESTAMP(NANOS) parquet, which
Spark cannot scan natively; with ``spark.sql.legacy.parquet.nanosAsLong``
it arrives as a long and is converted to a µs timestamp here (floor
division — DuckDB's ns→µs cast truncates the same way).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns since epoch -> µs timestamp. MUST be integer division (`div`):
        # `/` promotes int64 ns to double, which loses precision above
        # 2^53 and shifts some values ±1 µs vs DuckDB's exact epoch_ns//1000
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    for name in tables or FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
