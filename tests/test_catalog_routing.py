"""LakeCatalog (Glue analogue) + routed apply (S7 otfMetadata routing)."""

from __future__ import annotations

import json

import pytest

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
    apply_routed,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_transform import (
    transform,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.catalog import (
    LakeCatalog,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (
    RETAIL_TRANS,
    RETAIL_TRANS_KEYS,
    RETAIL_TRANS_PARTITION,
)


def _env(trans_id, op="insert", table="retail_trans"):
    return json.dumps({
        "data": {"trans_id": trans_id, "customer_id": "c", "event": "visit",
                 "sku": "S", "amount": 1, "device": "pc",
                 "trans_datetime": "2023-01-16T06:00:00Z"},
        "metadata": {"timestamp": f"2023-01-16T06:00:{trans_id % 60:02d}.000001Z",
                     "record-type": "data", "operation": op,
                     "partition-key-type": "primary-key", "schema-name": "testdb",
                     "table-name": table, "transaction-id": trans_id},
    })


def test_catalog_lifecycle(spark, tmp_path):
    cat = LakeCatalog(str(tmp_path / "wh"))
    cat.create_database("demo_db")
    t = cat.create_table("demo_db", "t1", RETAIL_TRANS,
                         keys=RETAIL_TRANS_KEYS, cluster_by=RETAIL_TRANS_PARTITION)
    assert cat.databases() == ["demo_db"]
    assert cat.tables("demo_db") == ["t1"]
    # idempotent create (IF NOT EXISTS), loads the same table
    again = cat.create_table("demo_db", "t1", RETAIL_TRANS)
    assert again.root == t.root
    with pytest.raises(ValueError):
        cat.create_table("demo_db", "t1", RETAIL_TRANS, if_not_exists=False)
    cat.drop_table("demo_db", "t1")
    assert cat.tables("demo_db") == []


def test_routed_apply_two_tables(spark, tmp_path):
    """One micro-batch carrying records for two destination tables lands
    each slice in its own table (per-record otfMetadata routing)."""
    cat = LakeCatalog(str(tmp_path / "wh"))
    t_a = cat.create_table("db", "retail_a", RETAIL_TRANS,
                           keys=RETAIL_TRANS_KEYS, cluster_by=RETAIL_TRANS_PARTITION)
    t_b = cat.create_table("db", "retail_b", RETAIL_TRANS,
                           keys=RETAIL_TRANS_KEYS, cluster_by=RETAIL_TRANS_PARTITION)

    lines = [(_env(i),) for i in range(1, 4)] + [(_env(i),) for i in range(10, 12)]
    df = spark.createDataFrame(lines, "value string")
    # two transforms simulate the per-record routing annotation differing
    good_a, _ = transform(df.limit(3), "db", "retail_a")
    good_b, _ = transform(df.subtract(df.limit(3)), "db", "retail_b")
    good = good_a.unionByName(good_b)

    versions = apply_routed({"retail_a": t_a, "retail_b": t_b}, good)
    assert set(versions) == {"retail_a", "retail_b"}
    assert t_a.read(spark).count() == 3
    assert t_b.read(spark).count() == 2
    # unknown destination ignored silently
    good_c, _ = transform(df.limit(1), "db", "nowhere")
    assert apply_routed({"retail_a": t_a}, good_c) == {}


def test_catalog_rejects_escaping_identifiers(tmp_path):
    """db/table names with separators or '..' would create — or DROP —
    paths outside the warehouse root (review round 11); dirty-but-
    contained names (leading space, the transformer-fidelity case)
    stay legal."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.catalog import (
        LakeCatalog,
    )

    cat = LakeCatalog(str(tmp_path / "wh"))
    sch = T.StructType([T.StructField("id", T.IntegerType())])
    for bad_db, bad_tbl in (("..", "t"), ("db", ".."), ("a/b", "t"),
                            ("db", "x/y"), ("", "t"), ("db", "")):
        with _pytest.raises(ValueError, match="identifier"):
            cat.create_table(bad_db, bad_tbl, sch)
        with _pytest.raises(ValueError, match="identifier"):
            cat.drop_table(bad_db, bad_tbl)
    # dirty-but-contained is fine
    t = cat.create_table("db", " retail_trans", sch)
    assert cat.tables("db") == [" retail_trans"]


def test_catalog_create_if_not_exists_survives_create_race(tmp_path, monkeypatch):
    """exists-then-create is not atomic: when a concurrent creator wins
    the exclusive v0 publish, IF NOT EXISTS must return the winner's
    table, not raise CommitConflict (review round 11)."""
    import pytest as _pytest
    from pyspark.sql import types as T

    import transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.catalog as catmod
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.catalog import (
        LakeCatalog,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.lake_table import (
        CommitConflict,
        LakeTable,
    )

    cat = LakeCatalog(str(tmp_path / "wh"))
    sch = T.StructType([T.StructField("id", T.IntegerType())])
    real_create = LakeTable.create.__func__

    calls = {"n": 0}

    def racing_create(cls, root, schema, **kw):
        # simulate the interleaving: another process creates the table
        # between our exists() check and our create()
        calls["n"] += 1
        real_create(cls, root, schema, **kw)
        raise CommitConflict("snapshot v0 already exists")

    monkeypatch.setattr(
        LakeTable, "create", classmethod(racing_create)
    )
    t = cat.create_table("db", "t", sch)  # must NOT raise
    assert calls["n"] == 1
    monkeypatch.undo()
    assert cat.tables("db") == ["t"]
