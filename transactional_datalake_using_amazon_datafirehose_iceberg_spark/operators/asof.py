"""As-of join — latest right-side row with ts <= left ts, per key.

Spark has no native ASOF JOIN (SURVEY.md §2.5: needed for CDC-style
point-in-time queries). Rather than a range join + row_number (which
shuffles |L|x|candidates|), this uses the union+window trick:

1. tag both sides and UNION them on a common schema;
2. one window per key ordered by (ts, side) carries the last seen
   right-side ROW forward as a single struct (``last_value ... IGNORE
   NULLS`` over a per-right-row struct, so timestamp and values always
   travel together);
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
    direction: str = "backward",
) -> DataFrame:
    """Attach, to every left row, ``value_cols`` from the matched right
    row with the same ``on`` keys. Left rows with no match get NULLs
    (LEFT ASOF JOIN).

    ``direction`` (pandas ``merge_asof(direction=...)`` parity):
    ``"backward"`` matches the LATEST right row with ``right_ts`` <=
    ``left_ts`` (the default), ``"forward"`` the EARLIEST right row
    with ``right_ts`` >= ``left_ts``, ``"nearest"`` whichever of the
    two is closer in time (ties go backward, as in pandas). Backward
    and forward are one window scan each; nearest carries both and
    picks per row — still the single key shuffle, one extra sort.

    ``tolerance``: maximum allowed time distance in SECONDS (pandas
    ``merge_asof(tolerance=...)`` / kdb ``wj`` semantics): a match
    farther than ``tolerance`` from ``left_ts`` is discarded (NULLs),
    not attached. Distances are MICROSECOND-exact (``unix_micros``,
    integer arithmetic — review round 11: second-truncated distances
    made sub-second ``nearest`` gaps tie to 0-vs-0 and always resolve
    backward, and quantized the tolerance boundary; DuckDB's
    ``epoch_us`` gives the identical integer). Same single shuffle —
    the matched right timestamp rides the window carry and the bound
    is one post-filter expression, no extra join."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    l_cols = left.columns
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in l_cols if c not in on and c != left_ts],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    # A right row with a NULL timestamp can never PROVE <= / >= any left
    # timestamp, so it is no candidate in any direction — yet unfiltered
    # it SORTS FIRST under the ascending scan (NULLS FIRST) and was
    # carried as the backward "match" for every left row before the
    # first real right row; with tolerance=None (within = isNotNull)
    # its values attached, while the tolerance path's NULL age treated
    # the same row as no-match — inconsistent, and in the nearest
    # branch its NULL age lost every comparison and still won via
    # otherwise(back) over a real forward match (review round 13).
    # Left rows with NULL ts stay (left-join contract: row kept, NULL
    # match) — their NULL __ts can never equal a carried __mts bound.
    tagged_right = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols if c not in on and c != left_ts],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)

    # ONE carried struct per match, not one carry per column: per-column
    # last(__r_c, ignorenulls=True) could backfill a value from an
    # EARLIER right row when the matched (latest) right row holds NULL
    # in that column, while the staleness bound was evaluated against
    # the matched row's timestamp — mismatched rows (round-9 advice).
    # The struct is non-NULL for every right row (even all-NULL fields),
    # so ts and values always come from the SAME matched row — pandas
    # merge_asof semantics: the matched row's NULL stays NULL.
    def _carry(descending: bool):
        # Ascending scan + "last right row seen" = latest right <= left
        # (backward). Descending scan = earliest right >= left
        # (forward). Either way, at equal __ts the right row (__side 0)
        # sorts FIRST, so boundary equality matches (<= / >=).
        order = F.col("__ts").desc() if descending else F.col("__ts").asc()
        w = (
            Window.partitionBy(*on)
            .orderBy(order, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(
            F.when(
                F.col("__side") == 0,
                F.struct(
                    F.col("__ts").alias("__mts"),
                    *[F.col(f"__r_{c}").alias(c) for c in value_cols],
                ),
            ),
            ignorenulls=True,
        ).over(w)

    if direction == "backward":
        matched = _carry(descending=False)
    elif direction == "forward":
        matched = _carry(descending=True)
    else:  # nearest: both scans over the SAME key shuffle, pick per row
        back, fwd = _carry(descending=False), _carry(descending=True)
        back_age = F.unix_micros(F.col("__ts")) - F.unix_micros(back["__mts"])
        fwd_age = F.unix_micros(fwd["__mts"]) - F.unix_micros(F.col("__ts"))
        matched = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            # strict <: an equidistant pair goes backward (pandas tie rule)
            .when(fwd_age < back_age, fwd)
            .otherwise(back)
        )
    carried = unioned.select(
        *on,
        "__ts",
        "__side",
        *[c for c in l_cols if c not in on and c != left_ts],
        matched.alias("__match"),
    )
    # time distance from the matched row, nonnegative in every
    # direction; integer microseconds (exact on both engines)
    age_us = F.abs(
        F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__match.__mts"))
    )
    # A NULL-ts LEFT row has no position on the time axis either: under
    # the forward/nearest scans it sorts past every right row (DESC
    # NULLS LAST) and would carry the earliest right row as a "match"
    # on the tolerance-None path, while the tolerance path's NULL age
    # already rejects it — same inconsistency class as the right-side
    # filter above. The explicit __ts guard makes every direction
    # attach NULLs to a timestamp-less left row.
    within = (
        F.col("__ts").isNotNull() & F.col("__match").isNotNull()
        if tolerance is None
        else age_us <= F.lit(int(round(float(tolerance) * 1_000_000)))
    )
    out = carried.filter(F.col("__side") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[c for c in l_cols if c not in on and c != left_ts],
        *[
            F.when(within, F.col(f"__match.{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return out
