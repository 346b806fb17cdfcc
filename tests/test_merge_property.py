"""Property-based check of the transactional apply path.

Random sequences of keyed insert/update/delete micro-batches run through
collapse_latest_per_key + copy-on-write MERGE must converge to the same
state as a trivial dict reference model — for any op order, duplicate
keys within a batch, deletes of unknown keys, and replayed batches.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
    collapse_latest_per_key,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
    LakeTable,
    merge_into,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.IntegerType(), True),
        T.StructField("cat", T.StringType(), True),
    ]
)

ops_strategy = st.lists(  # one batch = ordered ops: (op, key, value)
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=12,
)
batches_strategy = st.lists(ops_strategy, min_size=1, max_size=4)


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


@given(batches=batches_strategy, replay_last=st.booleans())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_matches_reference_model(prop_spark, tmp_path_factory, batches, replay_last):
    spark = prop_spark
    table = LakeTable.create(
        str(tmp_path_factory.mktemp("prop") / "t"),
        SCHEMA,
        keys=["k"],
        cluster_by=["cat"],
        # lineage on: every random op interleaving must also keep
        # _row_id unique (asserted at the end)
        properties={"row-lineage": "true"},
    )
    model: dict[int, tuple] = {}

    def apply_spark(ops, seq_base):
        rows = [
            (k, v, "ab"[k % 2], op, seq_base + i)
            for i, (op, k, v) in enumerate(ops)
        ]
        df = spark.createDataFrame(
            rows, "k int, v int, cat string, operation string, _order_txn long"
        ).selectExpr("*", "CAST(NULL AS TIMESTAMP) AS _order_ts")
        latest = collapse_latest_per_key(df, ["k"])
        merge_into(
            table,
            latest.drop("_order_ts", "_order_txn"),
            on=["k"],
            op_col="operation",
            assume_unique=True,
        )

    def apply_model(ops):
        for op, k, v in ops:
            if op == "delete":
                model.pop(k, None)
            else:
                model[k] = (k, v, "ab"[k % 2])

    for i, ops in enumerate(batches):
        apply_spark(ops, seq_base=i * 1000)
        apply_model(ops)
    if replay_last:  # retry semantics: replaying a batch must be a no-op
        apply_spark(batches[-1], seq_base=(len(batches) - 1) * 1000)

    got = sorted((r["k"], r["v"], r["cat"]) for r in table.read(spark).collect())
    expected = sorted(model.values())
    assert got == expected

    # row lineage under arbitrary MERGE interleavings: every surviving
    # row has an id, and no two rows share one (block allocation +
    # physical materialization through COW rewrites never collide)
    ids = [r["_row_id"] for r in table.read(spark, with_row_ids=True).collect()]
    assert None not in ids
    assert len(ids) == len(set(ids)), ids

    # the CDC-OUT half must agree with the CDC-IN half: replaying the
    # full changelog (INSERT/UPDATE_AFTER set, DELETE remove) into an
    # empty dict reconstructs the same final state for ANY op
    # interleaving — model-checks the keyed single-join classification
    # and its duplicate-key fallback alike
    log_state: dict[int, tuple] = {}
    for r in sorted(
        table.changelog(spark, 0, table.current_version()).collect(),
        key=lambda r: r["_change_version"],
    ):
        if r["_change_type"] in ("INSERT", "UPDATE_AFTER"):
            log_state[r["k"]] = (r["k"], r["v"], r["cat"])
        elif r["_change_type"] == "DELETE":
            log_state.pop(r["k"], None)
    assert sorted(log_state.values()) == expected
