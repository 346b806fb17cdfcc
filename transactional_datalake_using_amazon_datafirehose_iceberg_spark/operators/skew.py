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

# join types whose semantics survive replicating the RIGHT side once per
# salt: every left row carries exactly one salt, and each right row
# exists under every salt, so per-left-row match sets are unchanged.
# Right/full outer (and right semi/anti) are NOT preserved — each
# unmatched right COPY would emit its own null-extended row (one per
# salt), silently multiplying output (review round 11).
_SALT_SAFE_JOINS = {
    "inner", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi",
    "anti", "leftanti", "left_anti",
}


def _row_spread_salt(n_salts: int):
    """Per-row deterministic salt that spreads even byte-identical rows:
    hash(partition id, row position). A whole-row hash gave identical
    hot-key rows (same key, same payload — the common event-stream
    shape) a single salt, leaving the skew unmitigated, and failed at
    plan time on MapType columns (F.hash does not support maps).
    monotonically_increasing_id is position-derived, so the salt is
    stable under task recompute for a deterministic input order —
    nondeterministic salts can duplicate/lose rows on shuffle-fetch
    failure (the SPARK-23207 repartition class)."""
    return F.pmod(
        F.hash(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    )


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

    Only left-preserving join types are accepted (see
    ``_SALT_SAFE_JOINS``): replication changes the multiplicity of the
    right side, so right/full outer variants would emit one
    null-extended row per unmatched right COPY instead of per row.
    """
    if how.lower().replace("_", "") not in {
        j.replace("_", "") for j in _SALT_SAFE_JOINS
    }:
        raise ValueError(
            f"salted_join: join type {how!r} is not salt-safe — the "
            "right side is replicated per salt, so right/full outer "
            "(and right semi/anti) joins would multiply unmatched "
            "right rows. Swap the inputs or use a plain join with "
            "AQE skew handling."
        )
    l = left.withColumn("__salt", _row_spread_salt(n_salts))
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
    splits a hot key across REDUCERS, which partial agg cannot.)

    The salt spreads by row position, not by value: hashing the VALUE
    gave zero reducer spread for the canonical skew workload — a hot
    key with a constant value (counting via sum(1)) salted every row
    identically, serializing the hot key on one reducer anyway
    (review round 11)."""
    salted = df.withColumn("__salt", _row_spread_salt(n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__psum"), F.count("*").alias("__pcnt")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").cast("bigint").alias("cnt"),
    )
