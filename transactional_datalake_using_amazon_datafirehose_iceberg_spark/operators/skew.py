"""Skew mitigation — explicit salting, complementing AQE's runtime
skew-join split (spark.sql.adaptive.skewJoin.enabled is on in session.py).

AQE handles skew it can observe at shuffle time; explicit salting is the
tool when a hot key is known a priori (the reference's analogue: DMS
partitions the stream by primary key, so one hot key serializes a queue
— dms_aurora_mysql_to_kinesis.py:123-141). Results are exactly equal to
the unsalted operation — pinned by the oracle-checked spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where the LEFT side's hot keys are spread over
    ``n_salts`` shuffle partitions; the RIGHT side is replicated x
    n_salts. Use when right is too big to broadcast but much smaller
    than left, and left's key histogram is skewed.

    Left salt is derived from a hash of the whole row (deterministic for
    a deterministic input), so identical runs produce identical plans.
    """
    l_salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("__salt", l_salt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial sum per
    (key, salt) then final sum per key. (Spark's hash aggregate already
    does map-side partial aggregation; explicit salting additionally
    splits a hot key across REDUCERS, which partial agg cannot.)"""
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(F.col(value_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__psum"), F.count("*").alias("__pcnt")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").cast("bigint").alias("cnt"),
    )
