"""Physical-plan assertions — the scale posture is part of the contract:
dimension joins broadcast, filters push to the parquet scan, column
pruning reaches ReadSchema, global top-k avoids a full sort."""

from __future__ import annotations

import contextlib
import io

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import (
    QUERY_SPECS,
)


def _plan(spark, name, sf_dir) -> str:
    df = QUERY_SPECS[name].run_spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, "q5_region_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    # the star-join dims must not produce a single sort-merge cascade
    assert plan.count("BroadcastHashJoin") >= 2


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 7 referenced columns are read, not all 11
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "l_orderkey" not in rs[0] and "l_partkey" not in rs[0]


def test_explicit_broadcast_hint_respected(spark, sf_dir):
    plan = _plan(spark, "join_broadcast_dims", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, "sort_topk_global", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_in_agg(spark, sf_dir):
    # AQE formatted mode shows codegen only on the final plan; run the
    # query and inspect the executed plan's codegen stage markers (*(n))
    df = QUERY_SPECS["q1_pricing_summary"].run_spark(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in final or "WholeStageCodegen" in final


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    # partial+final HashAggregate pair around the exchange
    assert plan.count("HashAggregate") >= 2


def test_mor_read_broadcasts_delete_antijoin(spark, tmp_path):
    """Merge-on-read reads must apply position deletes with a BROADCAST
    anti-join (deletes are metadata-scale; a shuffled anti-join of the
    corpus by (file,pos) would be a scale regression), and delete-free
    tables must keep the plain scan (no join at all)."""
    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )

    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
    ])
    t = LakeTable.create(
        str(tmp_path / "t"), schema, keys=["id"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(spark.createDataFrame([(i, float(i)) for i in range(10)], schema))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.read(spark).explain("formatted")
    assert "Join" not in buf.getvalue(), "delete-free read should be a plain scan"

    t.delete_where(spark, "id = 3")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.read(spark).explain("formatted")
    plan = buf.getvalue()
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
