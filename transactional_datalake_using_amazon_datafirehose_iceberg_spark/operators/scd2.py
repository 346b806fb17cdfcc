"""Slowly-changing-dimension Type 2 maintenance over a keyed lake table.

The reference pipeline applies CDC after-images destructively (one live
row per key — cdk_stacks/firehose_to_iceberg.py:114 ``unique_keys``).
SCD2 is the standard warehouse alternative the same stream feeds: keep
EVERY version of a key as its own row with a validity interval
(``valid_from``/``valid_to``) and an ``is_current`` flag, closing the
previous version when a new one arrives.

Design for scale: the delta for a micro-batch touches only the batch's
keys — one window over the batch (partitioned by key) chains the new
versions, and a broadcast join against the batch's per-key minimum
closes the previously-open rows. History volume never re-shuffles; the
MERGE that lands the delta rewrites only touched files (plans/merge.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_delta(
    open_rows: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    ts_col: str,
    seq_col: str,
) -> DataFrame:
    """Compute the SCD2 upsert delta for one change batch.

    ``open_rows``: the currently-open history rows (``is_current = 1``)
    for at least the batch's keys (extra keys are fine — only matching
    ones are touched); None/empty for the first batch. Must carry the
    same columns as the produced history: the batch's columns plus
    ``valid_from``, ``valid_to``, ``is_current``.

    ``batch``: the new versions — key columns, ``ts_col`` (event time),
    ``seq_col`` (unique tiebreak within a key, e.g. an event id), plus
    payload columns. Batches must arrive in event-time order per key
    (the CDC transport's per-key ordering guarantee, SURVEY.md §2.1 S4).

    Returns rows to MERGE by ``keys + [seq_col]``: the batch rows with
    their validity chained by a per-key window, plus the previously-open
    rows closed at the batch's first version per key.

    Replay/stale guard (review round 11): a re-delivered or
    late-arriving batch whose versions are not strictly newer than the
    key's open row — at-least-once delivery makes this routine — used
    to close the open row with ``valid_to`` EARLIER than its
    ``valid_from`` (an inverted interval) and resurrect the old version
    as ``is_current = 1``. Batch rows with ``(ts, seq)`` at or below
    the open row's are already in history and are dropped before
    chaining; an exact replay therefore produces an EMPTY delta.
    NULL-``ts`` rows keep flowing (the cdc_apply corrupt-timestamp
    contract), as do rows for keys with a NULL ``valid_from`` or an
    unparsed (NULL) sequence id on a timestamp tie — a NULL on either
    side of the seq tiebreak proves nothing, so the row applies rather
    than being guessed stale.

    Perf note: the returned delta embeds two broadcast joins against the
    open-row set; a caller that feeds it to a multi-pass consumer (e.g.
    ``merge_into``, which runs stats/probe/rewrite jobs) should
    ``.persist()`` the delta for the MERGE's lifetime, or every pass
    re-executes the guard and close joins against the history.
    """
    cur = None
    if open_rows is not None:
        # ONE restriction of the open-row set serves both the replay
        # guard and the close-join below (each previously joined
        # open_rows from scratch — two independent history scans per
        # delta execution; round-11 verdict perf item). The semi join
        # bounds `cur` by the batch's keys, so the broadcasts stay
        # metadata-scale even when the caller hands the dimension's
        # full open-row set. No .distinct() on the build side: the semi
        # join dedups inherently, and the distinct cost a full
        # batch-key shuffle per micro-batch inside the broadcast build
        # (bench: ~1.2 s over three batches at sf0.1).
        cur = open_rows.join(
            F.broadcast(batch.select(*keys)), on=keys, how="left_semi"
        )
        guard = cur.select(
            *keys,
            F.col("valid_from").alias("__cur_ts"),
            F.col(seq_col).alias("__cur_seq"),
        )
        batch = (
            batch.join(F.broadcast(guard), on=keys, how="left")
            .where(
                F.col("__cur_ts").isNull()
                | F.col(ts_col).isNull()
                | (F.col(ts_col) > F.col("__cur_ts"))
                # on a ts tie the seq tiebreak decides — but a NULL seq
                # on EITHER side proves nothing and flows through (the
                # struct(ts, seq) > struct(...) form yielded NULL on a
                # tie with an unparsed seq, and `where` silently dropped
                # the row as if stale; round-11 advice). A ts strictly
                # below the open row's stays provably stale regardless.
                | (
                    (F.col(ts_col) == F.col("__cur_ts"))
                    & (
                        F.col(seq_col).isNull()
                        | F.col("__cur_seq").isNull()
                        | (F.col(seq_col) > F.col("__cur_seq"))
                    )
                )
            )
            .drop("__cur_ts", "__cur_seq")
        )
    w = Window.partitionBy(*keys).orderBy(ts_col, seq_col)
    new_rows = (
        batch.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn(
            "is_current", F.col("valid_to").isNull().cast("int")
        )
    )
    if open_rows is None:
        return new_rows
    # first (earliest) SURVIVING new version per key closes the open row
    # (computed after the guard filter: a fully-replayed key contributes
    # no first and its open row stays untouched — the empty-delta
    # contract). The join is against the already-restricted `cur`, not
    # open_rows again, so the history is referenced once per branch.
    firsts = batch.groupBy(*keys).agg(
        F.min(F.struct(ts_col, seq_col)).alias("__first")
    ).select(*keys, F.col(f"__first.{ts_col}").alias("__close_ts"))
    closed = (
        cur.join(F.broadcast(firsts), on=keys, how="inner")
        .withColumn("valid_to", F.col("__close_ts"))
        .withColumn("is_current", F.lit(0))
        .drop("__close_ts")
    )
    return new_rows.unionByName(closed.select(*new_rows.columns))
