"""Skew mitigation — explicit salting, complementing AQE's runtime
skew-join split (spark.sql.adaptive.skewJoin.enabled is on in session.py).

AQE handles skew it can observe at shuffle time; explicit salting is the
tool when a hot key is known a priori (the reference's analogue: DMS
partitions the stream by primary key, so one hot key serializes a queue
— dms_aurora_mysql_to_kinesis.py:123-141). Results are exactly equal to
the unsalted operation — pinned by the oracle-checked spec.

Salt determinism: the default position-derived salt (see
``_row_spread_salt``) spreads even byte-identical rows but is only
stable under task recompute when the INPUT's partitioning and row order
are deterministic (a parquet/lake scan, a cached frame). Feeding it the
direct output of a shuffle whose order can vary across recomputes (the
SPARK-23207 repartition class) risks double-counted/lost rows after a
shuffle-fetch failure. For such sources pass ``salt_cols`` — a
content-hash salt over the named columns, deterministic under any
recompute (spread then depends on those columns varying within the hot
key).
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
    stable under task recompute ONLY for a deterministic input
    partitioning and order — see the module docstring for the
    precondition and the ``salt_cols`` content-hash opt-in."""
    return F.pmod(
        F.hash(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    )


def _content_salt(salt_cols: list[str], n_salts: int):
    """Content-hash salt: a pure function of the named columns, stable
    under ANY recompute (the pre-round-11 whole-row form, now scoped to
    caller-named columns so MapType payloads stay out of F.hash's
    domain). Spread requires the named columns to vary within a hot
    key — e.g. an event id or timestamp, not the hot key itself."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))


def _pick_salt(salt_cols: list[str] | None, n_salts: int):
    """None -> position salt (deterministic-input precondition). An
    EXPLICIT empty list is an error, not a silent fallback: a caller who
    opted into content salting must not be handed the recompute-unsafe
    default because their dynamically-computed column list came out
    empty (review round 12).

    n_salts must be positive and is validated HERE (both entry points
    route through): n_salts=0 would make salted_join's
    sequence(0, n_salts-1) DESCEND — Spark's sequence(0, -1) yields
    [0, -1] — replicating right rows under two bogus salts before
    pmod(x, 0) ever raises (round-14 review sweep)."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if salt_cols is None:
        return _row_spread_salt(n_salts)
    if not salt_cols:
        raise ValueError(
            "salt_cols is empty: pass None for the position salt, or "
            "name at least one column for the content salt"
        )
    return _content_salt(salt_cols, n_salts)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join where the LEFT side's hot keys are spread over
    ``n_salts`` shuffle partitions; the RIGHT side is replicated x
    n_salts. Use when right is too big to broadcast but much smaller
    than left, and left's key histogram is skewed.

    Only left-preserving join types are accepted (see
    ``_SALT_SAFE_JOINS``): replication changes the multiplicity of the
    right side, so right/full outer variants would emit one
    null-extended row per unmatched right COPY instead of per row.

    ``salt_cols``: opt-in content-hash salt over the named LEFT columns
    for inputs whose recompute order is not deterministic (module
    docstring); default is the position-derived spread salt.
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
    l = left.withColumn("__salt", _pick_salt(salt_cols, n_salts))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial sum per
    (key, salt) then final sum per key. (Spark's hash aggregate already
    does map-side partial aggregation; explicit salting additionally
    splits a hot key across REDUCERS, which partial agg cannot.)

    The default salt spreads by row position, not by value: hashing the
    VALUE gave zero reducer spread for the canonical skew workload — a
    hot key with a constant value (counting via sum(1)) salted every row
    identically, serializing the hot key on one reducer anyway (review
    round 11). Position salts require a deterministic input (module
    docstring); pass ``salt_cols`` for a recompute-stable content salt
    when the input is a nondeterministic shuffle output."""
    salted = df.withColumn("__salt", _pick_salt(salt_cols, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__psum"), F.count("*").alias("__pcnt")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").cast("bigint").alias("cnt"),
    )
