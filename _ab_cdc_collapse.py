"""Interleaved A/B: collapse_latest_per_key window form vs max_by form,
measured through the full cdc_retail_replay spec (registry methodology:
run_spark + count) at sf0.1, plus exact output equality of the collapse
itself over the spec's real micro-batches."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import get_spark
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators import cdc_apply
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import registry

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab_cdc_collapse", master="local[32]", shuffle_partitions=32)

old_form = cdc_apply.collapse_latest_per_key

def new_form(df, keys, order_cols=("_order_ts", "_order_txn")):
    content = F.xxhash64(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(*keys)
        .agg(F.max_by(
            F.struct(*df.columns),
            F.struct(*[F.col(c) for c in order_cols], content),
        ).alias("__lk_row"))
        .select("__lk_row.*")
    )

spec = registry.QUERY_SPECS["cdc_retail_replay"]

def run(form):
    cdc_apply.collapse_latest_per_key = form
    t0 = time.perf_counter()
    n = spec.run_spark(spark, SF_DIR).count()
    return time.perf_counter() - t0, n

# warm-up
run(old_form); run(new_form)
olds, news = [], []
for i in range(5):
    to, no = run(old_form)
    tn, nn = run(new_form)
    olds.append(to); news.append(tn)
    assert no == nn, (no, nn)
print("old:", [round(x,3) for x in olds], "best", round(min(olds),3), "mean", round(sum(olds)/5,3))
print("new:", [round(x,3) for x in news], "best", round(min(news),3), "mean", round(sum(news)/5,3))

# result equality of the final spec output
cdc_apply.collapse_latest_per_key = old_form
a = sorted(map(tuple, spec.run_spark(spark, SF_DIR).collect()))
cdc_apply.collapse_latest_per_key = new_form
b = sorted(map(tuple, spec.run_spark(spark, SF_DIR).collect()))
print("spec output identical:", a == b, f"({len(a)} rows)")
