"""Bucketing for co-located joins (SURVEY.md §2.5 / 100 TB posture):
pre-bucketing both sides of a recurring join key removes the shuffle
from every subsequent join — the physical plan must show no Exchange on
the bucketed sides."""

from __future__ import annotations

import contextlib
import io

import pytest

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources.catalog import (
    load_table,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    # external table paths: spark.sql.warehouse.dir is a static conf
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", f"{wh}/lineitem_b").saveAsTable("bktdb.lineitem_b"))
    (od.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", f"{wh}/orders_b").saveAsTable("bktdb.orders_b"))
    yield "bktdb.lineitem_b", "bktdb.orders_b"
    spark.sql("DROP TABLE IF EXISTS bktdb.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bktdb.orders_b")
    spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_bucketed_join_avoids_shuffle(spark, bucketed, sf_dir):
    li_b, od_b = bucketed
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(f"""
          SELECT o_orderpriority, COUNT(*) AS n
          FROM {li_b} JOIN {od_b} ON l_orderkey = o_orderkey
          GROUP BY o_orderpriority
        """)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        # no Exchange feeding the join: bucket layout co-locates both sides
        assert "Exchange" not in join_section, join_section

        # and it returns the same result as the unbucketed join
        li = load_table(spark, sf_dir, "lineitem")
        od = load_table(spark, sf_dir, "orders")
        expected = {
            (r["o_orderpriority"], r["n"])
            for r in li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority").count()
            .withColumnRenamed("count", "n").collect()
        }
        got = {(r["o_orderpriority"], r["n"]) for r in joined.collect()}
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
