"""Property check: asof_join == pandas.merge_asof on random inputs.

pandas is the semantics ORACLE here (the operator's docstring promises
merge_asof parity): every (direction, tolerance) combination must
agree row-for-row on random keyed, timestamped data — boundary
equality (allow_exact_matches), no-match NULLs, per-direction
staleness bounds, and the equidistant-ties-go-backward rule for
``nearest`` all fall out of the comparison rather than being pinned
one hand-picked case at a time.

Right-side timestamps are unique per key: with duplicates, which of
the equal-ts right rows wins is arbitrary in BOTH engines (pandas
takes input order, Spark takes scan order) and the property would
flake on tie-arbitration that no caller should rely on.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.asof import (
    asof_join,
)

_BASE = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return _BASE + dt.timedelta(seconds=seconds)


_sides = st.tuples(
    # left rows: (key, ts_seconds) — duplicates allowed
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 3600)),
        min_size=1,
        max_size=12,
    ),
    # right rows: (key, ts_seconds, value) — ts unique per key
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 3600), st.integers(-99, 99)),
        min_size=0,
        max_size=12,
        unique_by=lambda r: (r[0], r[1]),
    ),
    st.sampled_from(["backward", "forward", "nearest"]),
    st.sampled_from([None, 0, 60, 600, 3600]),
)


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


@given(case=_sides)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_pandas_merge_asof(prop_spark, case):
    left_rows, right_rows, direction, tolerance = case
    spark = prop_spark

    left = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(left_rows)],
        "k int, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(k, _ts(s), v) for k, s, v in right_rows],
        "k int, ts timestamp, v int",
    )
    got_df = asof_join(
        left, right, ["k"], "ts", "ts", ["v"],
        tolerance=tolerance, direction=direction,
    )
    got = sorted(
        (r["lid"], r["asof_v"]) for r in got_df.collect()
    )

    lpd = pd.DataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(left_rows)],
        columns=["k", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rpd = (
        pd.DataFrame(
            [(k, _ts(s), v) for k, s, v in right_rows],
            columns=["k", "ts", "v"],
        )
        # an empty frame defaults to object dtype, which merge_asof rejects
        .astype({"k": "int64", "ts": "datetime64[ns]", "v": "int64"})
        .sort_values("ts", kind="stable")
    )
    merged = pd.merge_asof(
        lpd,
        rpd,
        on="ts",
        by="k",
        direction=direction,
        tolerance=(
            None if tolerance is None else pd.Timedelta(seconds=tolerance)
        ),
    )
    want = sorted(
        (int(row.lid), None if pd.isna(row.v) else int(row.v))
        for row in merged.itertuples()
    )
    assert got == want, (direction, tolerance, left_rows, right_rows)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 3600.0])
def test_asof_null_timestamps_never_match(prop_spark, direction, tolerance):
    """Round-13 review: a NULL-ts right row sorted NULLS-FIRST under the
    ascending scan and was carried as the backward 'match' (values
    attached on the tolerance-None path); a NULL-ts left row sorted past
    every right row under the descending scans and matched the earliest
    right row in forward/nearest. Neither row has a position on the
    time axis: the right row must never match anything, the left row
    must be kept with NULLs (left-join contract) — in EVERY
    (direction, tolerance) combination."""
    spark = prop_spark
    left = spark.createDataFrame(
        [(1, _ts(100), 10), (1, None, 11)],
        "k long, lts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(1, None, 999), (1, _ts(50), 50), (1, _ts(200), 200)],
        "k long, rts timestamp, v long",
    )
    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["v"],
            tolerance=tolerance, direction=direction,
        ).collect()
    }
    assert set(got) == {10, 11}, "left rows must all survive"
    assert got[11] is None, "NULL-ts left row must match nothing"
    expected = {"backward": 50, "forward": 200, "nearest": 50}[direction]
    assert got[10] == expected, (
        f"real left row must match the real {direction} row, "
        f"never the NULL-ts right row"
    )
