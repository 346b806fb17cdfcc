"""Round-6 lakehouse feature tour: initial-default columns, row
lineage, the Python Data Source sink, cherry-pick publish, snapshot
expiry — one runnable script.

Run: python examples/lakehouse_features.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (  # noqa: E402
    LakeTable,
    merge_into,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.maintenance import (  # noqa: E402
    compact,
    expire_snapshots,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import (  # noqa: E402
    get_spark,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources import (  # noqa: E402
    LakeStreamDataSource,
)


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(tempfile.mkdtemp(prefix="lakehouse_"), "t")

    # 1. create with row lineage on
    t = LakeTable.create(
        root,
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ]),
        keys=["k"],
        properties={"row-lineage": "true"},
    )
    t.append(spark.sql("SELECT CAST(id AS LONG) k, CONCAT('a', id) v FROM range(4)"))

    # 2. initial-default column: metadata-only, old files read 'standard'
    t.add_column("tier", T.StringType(), default="standard")
    t.append(spark.sql("SELECT CAST(10 AS LONG) k, 'b0' v, 'gold' tier"))
    print("-- after ADD COLUMN ... DEFAULT 'standard' (no rewrite):")
    t.read(spark).orderBy("k").show()

    # 3. row lineage: stable _row_id through a MERGE
    merge_into(t, spark.sql("SELECT CAST(0 AS LONG) k, 'merged' v, 'gold' tier"))
    print("-- _row_id stable through MERGE (k=0 keeps id 0):")
    t.read(spark, with_row_ids=True).orderBy("k").show()

    # 4. distributed write path: df.write.format('lake_table')
    spark.dataSource.register(LakeStreamDataSource)
    (
        spark.sql("SELECT CAST(id + 100 AS LONG) k, CONCAT('s', id) v, 'std' tier FROM range(3)")
        .write.format("lake_table").option("path", root).mode("append").save()
    )
    print("-- rows after Python Data Source sink append:", t.read(spark).count())

    # 5. write-audit-publish with a moved base: cherry-pick
    t.create_branch("audit")
    b = t.branch("audit")
    b.append(spark.sql("SELECT CAST(200 AS LONG) k, 'staged' v, 'std' tier"))
    staged = b.current_version()
    t.append(spark.sql("SELECT CAST(201 AS LONG) k, 'mainline' v, 'std' tier"))
    t.cherry_pick(staged)
    print("-- staged row published via cherry_pick:",
          t.read(spark).filter(F.col("k") == 200).count())

    # 6. maintenance: compact then expire (tag pins survive)
    t.create_tag("audited")
    compact(spark, t)
    summary = expire_snapshots(t, keep_last=1)
    print("-- expire_snapshots:", summary)
    print("-- tag-pinned read still works:",
          t.read(spark, ref="audited").count(), "rows")


if __name__ == "__main__":
    main()
