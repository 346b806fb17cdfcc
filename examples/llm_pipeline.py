"""Training-data pipeline demo over the documents/embeddings fixtures:
dedup -> quality gate -> balanced sample -> chunk -> similarity search.

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python examples/llm_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.dedup as D  # noqa: E402
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import (  # noqa: E402
    get_spark,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources import (  # noqa: E402
    load_table,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. exact + near-dup removal (MinHash/LSH candidates, Jaccard verify,
    #    connected components; only cluster representatives survive)
    uniq = D.exact_dedup(docs, ["text"], "doc_id")
    pairs = D.jaccard_verify_docs(
        uniq,
        D.lsh_candidate_pairs(
            D.minhash_signature_mapside(uniq, "text", "doc_id"), "doc_id"
        ),
        "text",
        "doc_id",
        threshold=0.6,
    ).select("doc_a", "doc_b")
    dupes = (
        D.connected_components(pairs)
        .filter(F.col("id") != F.col("cluster_id"))
        .select(F.col("id").alias("doc_id"))
    )
    kept = uniq.join(F.broadcast(dupes), "doc_id", "left_anti")
    print("docs:", docs.count(), "-> after dedup:", kept.count())

    # 2. quality gate + per-language balanced sample
    kept = kept.filter(F.length("text") >= 50)
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")))
    sample = kept.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 20)
    sample.groupBy("lang").count().orderBy("lang").show()

    # 3. top-k similar documents for a few query embeddings
    cosine_topk(emb, query_ids=[0, 1, 2], k=3).show()


if __name__ == "__main__":
    main()
