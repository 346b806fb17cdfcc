"""Quickstart — the reference's end-to-end flow on this engine.

Reproduces the runbook (README.md of the reference: ingest CDC ->
transactional table -> SQL) plus the LLM-ops extensions, in one script:

    python examples/quickstart.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
    apply_batch,
    typed_rows,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_transform import (
    transform,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.catalog import (
    LakeCatalog,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import (
    QUERY_SPECS,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (
    RETAIL_TRANS,
    RETAIL_TRANS_KEYS,
    RETAIL_TRANS_PARTITION,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import get_spark
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources import (
    read_cdc_batch,
    write_golden_corpus,
)


def main() -> None:
    spark = get_spark(app_name="quickstart", master="local[4]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="quickstart_")

    # 1. CREATE DATABASE / TABLE (runbook steps 1-2)
    catalog = LakeCatalog(os.path.join(work, "warehouse"))
    table = catalog.create_table(
        "cdc_iceberg_demo_db", "retail_trans_iceberg", RETAIL_TRANS,
        keys=RETAIL_TRANS_KEYS, cluster_by=RETAIL_TRANS_PARTITION,
    )

    # 2. Ingest both golden CDC corpora (insert-only, then DML)
    p1, p2 = write_golden_corpus(os.path.join(work, "cdc"))
    for p in (p1, p2):
        good, dead = transform(read_cdc_batch(spark, p),
                               "cdc_iceberg_demo_db", "retail_trans_iceberg")
        version = apply_batch(table, typed_rows(good))
        print(f"applied {os.path.basename(p)} -> snapshot v{version}")

    # 3. Query it (the runbook's acceptance query + a peek)
    df = table.read(spark)
    df.createOrReplaceTempView("retail_trans_iceberg")
    n = spark.sql("SELECT COUNT(*) AS n FROM retail_trans_iceberg").collect()[0]["n"]
    print(f"SELECT COUNT(*) -> {n} (expected 12)")
    spark.sql("""
        SELECT event, COUNT(*) AS n, SUM(amount) AS total
        FROM retail_trans_iceberg GROUP BY event ORDER BY event
    """).show()

    # 4. Time travel (VERSION AS OF)
    print("rows at v1 (before the DML batch):", table.read(spark, version=1).count())

    # 5. Point DML (runbook UPDATE/DELETE)
    table.update_where(spark, "trans_id = 19", {"amount": "amount + 1"})
    table.delete_where(spark, "trans_id = 21")
    print("after UPDATE+DELETE:", table.read(spark).count(), "rows")

    # 6. Write-audit-publish: stage a fix on a branch, audit, publish
    table.create_tag("pre-audit")
    table.create_branch("audit")
    b = table.branch("audit")
    b.update_where(spark, "trans_id = 19", {"amount": "amount * 2"})
    print("main unchanged while staged:", table.read(spark).count(), "rows;",
          "branch:", b.read(spark).count(), "rows")
    table.fast_forward("audit")          # atomic publish
    print("published branch; refs:", {k: v["version"] for k, v in table.refs().items()})

    # 7. Metadata tables (Iceberg db.table.snapshots / .history parity)
    table.meta_snapshots(spark).select("version", "operation", "total_rows").show()

    # 8. An analytic + an LLM-ops query from the declared surface
    sf_dir = "/root/testdata/sf0.001"
    QUERY_SPECS["q5_region_revenue"].run_spark(spark, sf_dir).show()
    pairs = QUERY_SPECS["dedup_neardup_jaccard"].run_spark(spark, sf_dir)
    print("near-duplicate document pairs (jaccard >= 0.6):", pairs.count())

    spark.stop()


if __name__ == "__main__":
    main()
