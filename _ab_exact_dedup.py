"""Interleaved A/B: old exact_dedup (groupBy+semi-join+dropDuplicates)
vs new (min_by) at sf0.1, noop sink, 5 alternating rounds."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import get_spark
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.dedup import exact_dedup

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab_exact_dedup", master="local[32]", shuffle_partitions=32)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

def old_form(df, cols, id_col):
    keeps = df.groupBy(*cols).agg(F.min(id_col).alias(id_col))
    keeps_nn = keeps.where(F.col(id_col).isNotNull())
    on_keep = [df[c].eqNullSafe(keeps_nn[c]) for c in cols] + [df[id_col] == keeps_nn[id_col]]
    kept = df.join(keeps_nn, on=on_keep, how="left_semi").dropDuplicates(cols + [id_col])
    null_groups = keeps.where(F.col(id_col).isNull()).select(*cols)
    null_rows = df.where(F.col(id_col).isNull()).dropDuplicates(cols)
    on_null = [null_rows[c].eqNullSafe(null_groups[c]) for c in cols]
    null_kept = null_rows.join(null_groups, on=on_null, how="left_semi")
    return kept.unionByName(null_kept)

# row identity first
a = sorted(map(tuple, old_form(docs, ["text"], "doc_id").collect()))
b = sorted(map(tuple, exact_dedup(docs, ["text"], "doc_id").collect()))
print(f"row-identical: {a == b} ({len(a)} vs {len(b)} rows)")

def run(build):
    df = build(docs, ["text"], "doc_id")
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

# warm-up both
run(old_form); run(exact_dedup)
olds, news = [], []
for i in range(5):
    olds.append(run(old_form))
    news.append(run(exact_dedup))
print("old:", [round(x,3) for x in olds], "best", round(min(olds),3), "mean", round(sum(olds)/5,3))
print("new:", [round(x,3) for x in news], "best", round(min(news),3), "mean", round(sum(news)/5,3))
