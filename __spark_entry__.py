"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001.
``queries()`` — every declared operator from SURVEY.md §2 (assembled
from the engine's query registry).
``oracle_sql()`` — matching DuckDB SQL per query (omitted only for
genuinely non-SQL-expressible ops; the driver then records a weaker
rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import (  # noqa: E402
    QUERY_SPECS,
    get_oracle_sql,
    get_queries,
)

_FLAGSHIP = "q5_region_revenue"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (5-way star join + agg) on sf0.001."""
    return QUERY_SPECS[_FLAGSHIP].run_spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return get_queries()


def oracle_sql() -> dict[str, str]:
    return get_oracle_sql()
