"""The reference runbook's SQL surface (SURVEY.md §2.4 Q1-Q9):
DDL/catalog statements via Spark SQL, table DDL/DML via LakeTable."""

from __future__ import annotations

from pyspark.sql import types as T

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import LakeTable
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (
    RETAIL_TRANS,
    RETAIL_TRANS_KEYS,
    RETAIL_TRANS_PARTITION,
)


def test_q1_q8_catalog_ddl(spark):
    """CREATE DATABASE / SHOW DATABASES / SHOW TABLES / DESCRIBE
    (README.md:195-254, 284-286)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS cdc_iceberg_demo_db")
    dbs = [r[0] for r in spark.sql("SHOW DATABASES").collect()]
    assert "cdc_iceberg_demo_db" in dbs
    spark.sql("CREATE TABLE IF NOT EXISTS cdc_iceberg_demo_db.probe (a INT, b STRING)")
    tbls = [r["tableName"] for r in spark.sql("SHOW TABLES IN cdc_iceberg_demo_db").collect()]
    assert "probe" in tbls
    desc = {r["col_name"]: r["data_type"] for r in
            spark.sql("DESCRIBE TABLE cdc_iceberg_demo_db.probe").collect()}
    assert desc["a"] == "int" and desc["b"] == "string"
    spark.sql("DROP TABLE cdc_iceberg_demo_db.probe")
    spark.sql("DROP DATABASE cdc_iceberg_demo_db")


def test_q2_q7_table_lifecycle(spark, tmp_path):
    """CREATE TABLE PARTITIONED BY + INSERT VALUES + UPDATE + DELETE +
    SELECT COUNT(*) / LIMIT (README.md:292-309, 383-443, 456-460)."""
    # Q2: partitioned transactional table
    t = LakeTable.create(
        str(tmp_path / "retail"), RETAIL_TRANS,
        keys=RETAIL_TRANS_KEYS, cluster_by=RETAIL_TRANS_PARTITION,
    )
    # Q7: INSERT INTO ... VALUES (multi-row literal insert)
    rows = spark.sql("""
      SELECT * FROM VALUES
        (1, 'c1', 'cart', 'SKU1', 10, 'pc', TIMESTAMP '2023-01-16 06:00:00'),
        (2, 'c2', 'visit', 'SKU2', 1, 'mobile', TIMESTAMP '2023-01-16 06:01:00'),
        (3, 'c3', 'purchase', 'SKU3', 55, 'tablet', TIMESTAMP '2023-01-16 06:02:00')
      AS t(trans_id, customer_id, event, sku, amount, device, trans_datetime)
    """)
    t.append(rows)
    # Q4: SELECT * LIMIT
    assert len(t.read(spark).limit(2).collect()) == 2
    # Q5: UPDATE by point predicate
    t.update_where(spark, "trans_id = 1", {"amount": "3"})
    got = {r["trans_id"]: r["amount"] for r in t.read(spark).collect()}
    assert got[1] == 3
    # Q6: DELETE by point predicate
    t.delete_where(spark, "trans_id = 2")
    # Q3: SELECT COUNT(*) — the acceptance query
    t.read(spark).createOrReplaceTempView("retail_trans_iceberg")
    assert spark.sql("SELECT COUNT(*) c FROM retail_trans_iceberg").collect()[0]["c"] == 2


def test_q9_drop_and_secondary_index_note(spark, tmp_path):
    """DROP TABLE IF EXISTS; the MySQL secondary index maps to the
    cluster-by sort order (SURVEY.md §7.3 item 7), asserted via manifest
    stats being tight on the cluster column."""
    t = LakeTable.create(str(tmp_path / "t"),
                         T.StructType([T.StructField("event", T.StringType()),
                                       T.StructField("v", T.IntegerType())]),
                         cluster_by=["event"])
    import pyspark.sql.functions as F
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, "cart").otherwise("visit").alias("event"),
        F.col("id").cast("int").alias("v"),
    )
    t.append(df)
    m = t.manifest()
    for fmeta in m["files"]:
        # clustered write => every file covers a single event value
        assert fmeta["min"]["event"] == fmeta["max"]["event"]
    t.drop()
    assert not LakeTable.exists(str(tmp_path / "t"))
