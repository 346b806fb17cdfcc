"""As-of join — latest right-side row with ts <= left ts, per key.

Spark has no native ASOF JOIN (SURVEY.md §2.5: needed for CDC-style
point-in-time queries). Rather than a range join + row_number (which
shuffles |L|x|candidates|), this uses the union+window trick:

1. tag both sides and UNION them on a common schema;
2. one window per key ordered by (ts, side) carries the last seen
   right-side attributes forward (``last_value ... IGNORE NULLS``);
3. keep only left rows.

Cost: ONE shuffle by key of |L|+|R| rows and one sort — the same as a
single sort-merge join pass, and skew-safe under AQE. At equal
timestamps the right row sorts first, so ties honor ``<=`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: float | None = None,
) -> DataFrame:
    """Attach, to every left row, ``value_cols`` from the latest right
    row with the same ``on`` keys and ``right_ts`` <= ``left_ts``.
    Left rows with no prior right row get NULLs (LEFT ASOF JOIN).

    ``tolerance``: maximum allowed staleness in SECONDS (pandas
    ``merge_asof(tolerance=...)`` / kdb ``wj`` semantics): a match
    older than ``left_ts - tolerance`` is discarded (NULLs), not
    attached. Computed on second-truncated timestamps (``unix_
    timestamp`` both sides), so engines agree exactly. Same single
    shuffle — the matched right timestamp rides the window carry and
    the bound is one post-filter expression, no extra join."""
    l_cols = left.columns
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in l_cols if c not in on and c != left_ts],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols if c not in on and c != left_ts],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "__ts",
        "__side",
        *[c for c in l_cols if c not in on and c != left_ts],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
        # the matched right row's own timestamp (for the staleness bound)
        F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        ).over(w).alias("__asof_ts"),
    )
    within = (
        F.lit(True)
        if tolerance is None
        else (
            F.unix_timestamp(F.col("__ts"))
            - F.unix_timestamp(F.col("__asof_ts"))
        ) <= F.lit(float(tolerance))
    )
    out = carried.filter(F.col("__side") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[c for c in l_cols if c not in on and c != left_ts],
        *[
            F.when(within, F.col(f"__asof_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return out
