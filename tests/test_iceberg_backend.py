"""Dual-backend CDC replay: the golden corpus must produce the same
12-row outcome on the offline LakeTable format AND (when the Iceberg
Spark runtime jar is on the classpath — never in this sandbox, always
on a real cluster) on a genuine Iceberg hadoop-catalog table through
the same apply path. Proves the LakeTable API is the drop-in slot the
reference's managed Iceberg destination plugs back into."""

from __future__ import annotations

import pytest

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
    apply_batch,
    typed_rows,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_transform import (
    transform,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import LakeTable
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.iceberg_compat import (
    IcebergTable,
    configure_catalog,
    iceberg_available,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (
    RETAIL_TRANS,
    RETAIL_TRANS_KEYS,
    RETAIL_TRANS_PARTITION,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources.cdc_jsonl import (
    read_cdc_batch,
    write_golden_corpus,
)


def _replay(spark, table, tmp_path):
    p1, p2 = write_golden_corpus(str(tmp_path / "gen"))
    for p in (p1, p2):
        good, _dead = transform(read_cdc_batch(spark, p), "db", "tbl")
        apply_batch(table, typed_rows(good))
    return sorted(tuple(r) for r in table.read(spark).collect())


def test_cdc_replay_laketable(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "retail"),
        RETAIL_TRANS,
        keys=RETAIL_TRANS_KEYS,
        cluster_by=RETAIL_TRANS_PARTITION,
    )
    assert len(_replay(spark, t, tmp_path)) == 12


def test_cdc_replay_real_iceberg(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("Iceberg Spark runtime jar not on classpath (offline sandbox)")
    configure_catalog(spark, str(tmp_path / "warehouse"))
    t = IcebergTable.create(
        spark,
        "lakehouse.db.retail_trans",
        RETAIL_TRANS,
        keys=RETAIL_TRANS_KEYS,
        cluster_by=RETAIL_TRANS_PARTITION,
    )
    rows = _replay(spark, t, tmp_path)
    assert len(rows) == 12
    # and both backends agree row-for-row
    lt = LakeTable.create(
        str(tmp_path / "retail_lt"),
        RETAIL_TRANS,
        keys=RETAIL_TRANS_KEYS,
        cluster_by=RETAIL_TRANS_PARTITION,
    )
    assert rows == _replay(spark, lt, tmp_path)
