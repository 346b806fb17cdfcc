"""End-to-end CDC pipeline demo — the reference's whole architecture
(DMS envelopes -> transform -> routed MERGE apply -> SQL) in one script.

Run: python examples/cdc_pipeline.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (  # noqa: E402
    apply_batch,
    typed_rows,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_transform import (  # noqa: E402
    transform,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (  # noqa: E402
    LakeTable,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (  # noqa: E402
    RETAIL_TRANS,
    RETAIL_TRANS_KEYS,
    RETAIL_TRANS_PARTITION,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import (  # noqa: E402
    get_spark,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources import (  # noqa: E402
    read_cdc_batch,
    write_golden_corpus,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.streaming.pipeline import (  # noqa: E402
    CdcStreamPipeline,
)


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="cdc_demo_")
    p1, p2 = write_golden_corpus(os.path.join(work, "in"))

    # --- batch replay (transform -> latest-per-key -> MERGE) -------------
    table = LakeTable.create(
        os.path.join(work, "retail"),
        RETAIL_TRANS,
        keys=RETAIL_TRANS_KEYS,
        cluster_by=RETAIL_TRANS_PARTITION,
    )
    for p in (p1, p2):
        good, dead = transform(read_cdc_batch(spark, p), "demo_db", "retail_trans")
        apply_batch(table, typed_rows(good))
    print("live rows after batch replay:", table.read(spark).count())  # 12

    # --- the same thing as a Structured Streaming job --------------------
    stream_table = LakeTable.create(
        os.path.join(work, "retail_stream"),
        RETAIL_TRANS,
        keys=RETAIL_TRANS_KEYS,
        cluster_by=RETAIL_TRANS_PARTITION,
    )
    q = CdcStreamPipeline(stream_table, "demo_db", "retail_trans").start(
        spark,
        os.path.join(work, "in"),
        os.path.join(work, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    print("live rows after streaming replay:", stream_table.read(spark).count())

    # --- time travel, changelog, equality delete -------------------------
    print("rows at version 1:", table.read(spark, version=1).count())  # 10
    log = table.changelog(spark, 1, table.current_version())
    log.groupBy("_change_type").count().orderBy("_change_type").show()
    table.delete_eq([{"trans_id": 19}])  # keys-only commit, no data I/O
    print("after equality delete:", table.read(spark).count())

    # --- SQL over the lake table -----------------------------------------
    table.read(spark).createOrReplaceTempView("retail")
    spark.sql(
        "SELECT event, COUNT(*) AS n, SUM(amount) AS amount "
        "FROM retail GROUP BY event ORDER BY event"
    ).show()


if __name__ == "__main__":
    main()
