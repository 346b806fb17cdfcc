"""Property-based check of the SCD2 delta operator.

Random per-key version sequences, split into arbitrary event-time-ordered
micro-batches (the CDC transport's per-key ordering guarantee), applied
through scd2_delta with at-least-once delivery (random batch replays),
must converge to exactly the history a global LEAD() recompute gives:
every version a row, validity chained per key, one open row per key —
and a replayed batch must produce an EMPTY delta.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.scd2 import (
    scd2_delta,
)

_SCHEMA = "k long, seq long, ts long, payload string"


@st.composite
def _timeline(draw):
    """Per-key strictly-increasing version timestamps with globally
    unique seq ids, plus random batch cut points over the GLOBAL
    event-time order (so per-key order holds across batches)."""
    n_keys = draw(st.integers(min_value=1, max_value=3))
    events = []
    seq = 0
    for k in range(n_keys):
        n_versions = draw(st.integers(min_value=1, max_value=5))
        ts_values = sorted(
            draw(
                st.sets(
                    st.integers(min_value=0, max_value=50),
                    min_size=n_versions,
                    max_size=n_versions,
                )
            )
        )
        for ts in ts_values:
            events.append((k, seq, ts))
            seq += 1
    # global event-time order; same-ts events across keys are fine
    # (ordering within a key is what the operator contracts on)
    events.sort(key=lambda e: (e[2], e[0]))
    n_batches = draw(st.integers(min_value=1, max_value=3))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(events)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(events)]:
        batches.append(events[prev:c])
        prev = c
    replay_after = draw(
        st.lists(st.booleans(), min_size=len(batches), max_size=len(batches))
    )
    return batches, replay_after


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


@given(timeline=_timeline())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_matches_global_lead_recompute(prop_spark, timeline):
    spark = prop_spark
    batches, replay_after = timeline

    history: dict[tuple, tuple] = {}  # (k, seq) -> row tuple

    def open_rows_df():
        rows = [r for r in history.values() if r[6] == 1]
        if not rows:
            return None
        return spark.createDataFrame(
            rows,
            _SCHEMA + ", valid_from long, valid_to long, is_current int",
        )

    def apply(batch):
        if not batch:
            return 0
        bdf = spark.createDataFrame(
            [(k, s, ts, f"p{s}") for k, s, ts in batch], _SCHEMA
        )
        delta = scd2_delta(open_rows_df(), bdf, ["k"], "ts", "seq").collect()
        for r in delta:  # MERGE by (k, seq)
            history[(r["k"], r["seq"])] = (
                r["k"], r["seq"], r["ts"], r["payload"],
                r["valid_from"], r["valid_to"], r["is_current"],
            )
        return len(delta)

    all_events = []
    for i, batch in enumerate(batches):
        apply(batch)
        all_events.extend(batch)
        if replay_after[i] and batch:
            # at-least-once delivery: the SAME batch re-applied must be
            # an empty delta — no interval inversion, no resurrection
            n = apply(batch)
            assert n == 0, f"replayed batch {i} produced a non-empty delta"

    # reference model: global LEAD() recompute per key
    expected = set()
    by_key: dict[int, list] = {}
    for k, s, ts in all_events:
        by_key.setdefault(k, []).append((ts, s))
    for k, versions in by_key.items():
        versions.sort()
        for i, (ts, s) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            expected.add(
                (k, s, ts, f"p{s}", ts, nxt, 1 if nxt is None else 0)
            )

    assert set(history.values()) == expected

    # the final history must also agree with Spark's own LEAD() over
    # the full event set (the spec oracle's formulation)
    if all_events:
        full = spark.createDataFrame(
            [(k, s, ts, f"p{s}") for k, s, ts in all_events], _SCHEMA
        )
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy("ts", "seq")
        lead = full.select(
            "k", "seq", "ts", "payload",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().cast("int").alias("is_current"),
        )
        got_lead = {tuple(r) for r in lead.collect()}
        assert set(history.values()) == got_lead


def test_scd2_first_batch_null_ts_single_open_row(prop_spark):
    """Round-12 advice: a FIRST batch (open_rows is None) with two
    NULL-ts versions for one key used a bare lead(ts), which cannot
    distinguish "no successor" from "NULL-ts successor" — both rows got
    is_current = 1, seeding a violation of the one-open-row-per-key
    invariant every later delta relies on. The struct-LEAD form must
    leave exactly one open row per key on both NULL-ts-only and mixed
    keys."""
    spark = prop_spark
    bdf = spark.createDataFrame(
        [
            (1, 0, None, "a"),  # key 1: two NULL-ts versions
            (1, 1, None, "b"),
            (2, 2, None, "c"),  # key 2: NULL-ts then a real ts
            (2, 3, 5, "d"),
        ],
        _SCHEMA,
    )
    delta = scd2_delta(None, bdf, ["k"], "ts", "seq").collect()
    assert len(delta) == 4
    by_key: dict[int, list] = {}
    for r in delta:
        by_key.setdefault(r["k"], []).append(r)
    for k, rows in by_key.items():
        assert sum(r["is_current"] for r in rows) == 1, (
            f"key {k}: expected exactly one open row, got {rows}"
        )
    # NULL ts orders first (ASC NULLS FIRST), so the open rows are
    # seq 1 (key 1) and seq 3 (key 2); seq 2's valid_to is the real ts.
    open_seqs = {r["seq"] for r in delta if r["is_current"] == 1}
    assert open_seqs == {1, 3}
    r2 = next(r for r in delta if r["seq"] == 2)
    assert r2["valid_to"] == 5
