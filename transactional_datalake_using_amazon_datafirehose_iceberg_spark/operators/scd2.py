"""Slowly-changing-dimension Type 2 maintenance over a keyed lake table.

The reference pipeline applies CDC after-images destructively (one live
row per key — cdk_stacks/firehose_to_iceberg.py:114 ``unique_keys``).
SCD2 is the standard warehouse alternative the same stream feeds: keep
EVERY version of a key as its own row with a validity interval
(``valid_from``/``valid_to``) and an ``is_current`` flag, closing the
previous version when a new one arrives.

Design for scale: the delta for a micro-batch touches only the batch's
keys — ONE broadcast semi-join restricts the open history rows to the
batch's keys, then a single key-partitioned shuffle over (restricted
open rows ∪ batch) computes the replay guard, the version chaining and
the close in two window passes. History volume never re-shuffles; the
MERGE that lands the delta rewrites only touched files (plans/merge.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_VALIDITY_COLS = ("valid_from", "valid_to", "is_current")
_SIDE = "__scd2_side"


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
    ``valid_from``, ``valid_to``, ``is_current``, with at most ONE open
    row per key (the SCD2 invariant the MERGE maintains).

    ``batch``: the new versions — key columns, ``ts_col`` (event time),
    ``seq_col`` (unique tiebreak within a key, e.g. an event id), plus
    payload columns. Batches must arrive in event-time order per key
    (the CDC transport's per-key ordering guarantee, SURVEY.md §2.1 S4).

    Returns rows to MERGE by ``keys + [seq_col]``: the batch rows with
    their validity chained by a per-key window, plus the previously-open
    rows closed at the batch's first surviving version per key.

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

    Physical shape (round-12 continuation rewrite): ONE broadcast
    (the batch-key semi-join restricting ``open_rows``) plus ONE
    key-partitioned shuffle of (restricted open rows ∪ batch). The
    guard bound rides an unordered per-key window MAX over the open
    row; chaining AND closing are one LEAD over the (side, ts, seq)
    sort — the open row sorts first, so its LEAD is exactly the
    batch's first surviving version (NULL-ts versions order first,
    identical to the previous ``min(struct(ts, seq))`` close since
    both orderings put NULL smallest; pinned in
    tests/test_merge_conditional.py). The previous formulation
    evaluated the restricted open set twice and built three broadcast
    exchanges per micro-batch — ~16 driver-sequential jobs per delta
    at micro-batch scale, vs ~4 for this shape.

    Perf note: the returned delta embeds the semi-join and the union
    window; a caller that feeds it to a multi-pass consumer (e.g.
    ``merge_into``, which runs stats/probe/rewrite jobs) should
    ``.persist()`` the delta for the MERGE's lifetime, or every pass
    re-executes the guard window against the history.
    """
    w_chain = Window.partitionBy(*keys).orderBy(ts_col, seq_col)
    if open_rows is None:
        # Same struct-wrapped LEAD as the union path below: a bare
        # lead(ts) cannot distinguish "no successor" from "successor
        # with NULL ts", so a key whose first batch carried two NULL-ts
        # versions got is_current = 1 on BOTH rows — seeding a
        # violation of the at-most-one-open-row-per-key invariant the
        # union path's guard MAX and LEAD close rely on for every
        # subsequent delta (round-12 advice).
        nxt0 = F.lead(F.struct(F.col(ts_col).alias("__nts"))).over(w_chain)
        return (
            batch.withColumn("__nxt", nxt0)
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.col("__nxt")["__nts"])
            .withColumn("is_current", F.col("__nxt").isNull().cast("int"))
            .drop("__nxt")
        )

    bcols = [c for c in batch.columns if c not in _VALIDITY_COLS]
    if _SIDE in bcols:
        raise ValueError(f"batch column {_SIDE!r} collides with the delta tag")

    # ONE restriction of the open-row set, used exactly once: the semi
    # join bounds the union's open side by the batch's keys, so the
    # shuffle stays batch-scale even when the caller hands the
    # dimension's full open-row set. No .distinct() on the build side:
    # the semi join dedups inherently (round-11 verdict perf item).
    # broadcast scale-class: micro-batch key set, bounded by the trigger
    # interval — never dimension-cardinality
    cur = open_rows.join(
        F.broadcast(batch.select(*keys)), on=keys, how="left_semi"
    )
    o_t = cur.select(*bcols, "valid_from", F.lit(0).alias(_SIDE))
    b_t = batch.select(
        *bcols, F.col(ts_col).alias("valid_from"), F.lit(1).alias(_SIDE)
    )
    u = o_t.unionByName(b_t)

    # the guard bound (the open row's valid_from/seq) as an unordered
    # per-key window MAX — NULL when the key has no open row, in which
    # case everything passes, exactly like the former left-join miss.
    # NULL keys: the semi join above can never match a NULL-keyed open
    # row (null-unsafe equality), so a NULL-key partition holds only
    # batch rows and the guard is vacuous there — same as the join form.
    w_key = Window.partitionBy(*keys)
    cur_s = F.max(
        F.when(
            F.col(_SIDE) == 0,
            F.struct(
                F.col("valid_from").alias("__ts"),
                F.col(seq_col).alias("__seq"),
            ),
        )
    ).over(w_key)
    guarded = (
        u.withColumn("__cur_ts", cur_s["__ts"])
        .withColumn("__cur_seq", cur_s["__seq"])
        .where(
            (F.col(_SIDE) == 0)
            | F.col("__cur_ts").isNull()
            | F.col(ts_col).isNull()
            | (F.col(ts_col) > F.col("__cur_ts"))
            # on a ts tie the seq tiebreak decides — but a NULL seq on
            # EITHER side proves nothing and flows through (the
            # struct(ts, seq) > struct(...) form yielded NULL on a tie
            # with an unparsed seq, and `where` silently dropped the
            # row as if stale; round-11 advice). A ts strictly below
            # the open row's stays provably stale regardless.
            | (
                (F.col(ts_col) == F.col("__cur_ts"))
                & (
                    F.col(seq_col).isNull()
                    | F.col("__cur_seq").isNull()
                    | (F.col(seq_col) > F.col("__cur_seq"))
                )
            )
        )
    )
    # one LEAD serves both sides: ordered (side, ts, seq) the open row
    # sorts FIRST, so its successor is the batch's earliest surviving
    # version (its new valid_to); batch rows chain each other. The
    # struct wrapper keeps a NULL-ts successor visible (a bare
    # lead(ts) could not distinguish "no successor" from "successor
    # with NULL ts"). A fully-replayed key has no surviving batch row:
    # its open row's LEAD is NULL and the row drops out — the
    # empty-delta contract.
    w_all = Window.partitionBy(*keys).orderBy(_SIDE, ts_col, seq_col)
    nxt = F.lead(F.struct(F.col(ts_col).alias("__nts"))).over(w_all)
    return (
        guarded.withColumn("__nxt", nxt)
        .where((F.col(_SIDE) == 1) | F.col("__nxt").isNotNull())
        .select(
            *bcols,
            "valid_from",
            F.col("__nxt")["__nts"].alias("valid_to"),
            F.col("__nxt").isNull().cast("int").alias("is_current"),
        )
    )
