"""Interleaved A/B: mine_triplets window+filter+groupBy vs one
conditional max_by aggregate, noop sink at sf0.1, plus row equality."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import get_spark
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.similarity import (
    mine_triplets, with_norm, _cosine_sim,
)

SF_DIR = "/root/testdata/sf0.1"
ANCHORS = [0, 7, 21, 50, 113]
spark = get_spark(app_name="ab_mine_triplets", master="local[32]", shuffle_partitions=32)
emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

def new_form(emb, anchor_ids, id_col="vec_id", label_col="label", vec_col="embedding"):
    base = with_norm(emb, vec_col)
    anchors = base.filter(F.col(id_col).isin(anchor_ids)).select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("__albl"),
        F.col(vec_col).alias("__ae"),
        F.col("__norm").alias("__anorm"),
    )
    sims = (
        base.join(F.broadcast(anchors), F.col(id_col) != F.col("anchor_id"))
        .withColumn("sim", _cosine_sim(F.col("__ae"), F.col("__anorm"),
                                       F.col(vec_col), F.col("__norm")))
        .filter(F.col("sim").isNotNull())
        .withColumn("is_pos", (F.col(label_col) == F.col("__albl")).cast("int"))
    )
    def best(flag):
        # ordering: sim DESC, id ASC -> max over struct(sim, -id)
        o = F.when(F.col("is_pos") == flag,
                   F.struct(F.col("sim"), (-F.col(id_col)).alias("__negid")))
        return (F.max_by(F.col(id_col), o).cast("bigint"),
                F.max(F.when(F.col("is_pos") == flag, F.col("sim"))).cast("double"))
    pid, psim = best(1); nid, nsim = best(0)
    return (
        sims.groupBy("anchor_id")
        .agg(pid.alias("pos_id"), psim.alias("pos_sim"),
             nid.alias("neg_id"), nsim.alias("neg_sim"))
        .withColumn("margin", F.round(F.col("pos_sim") - F.col("neg_sim"), 6).cast("double"))
        .orderBy("anchor_id")
    )

a = sorted(map(tuple, mine_triplets(emb, ANCHORS).collect()))
b = sorted(map(tuple, new_form(emb, ANCHORS).collect()))
print("row-identical:", a == b, f"({len(a)} vs {len(b)})")
if a != b:
    for x, y in zip(a, b):
        if x != y: print("DIFF", x, y)

def run(build):
    df = build(emb, ANCHORS)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

run(mine_triplets); run(new_form)
olds, news = [], []
for i in range(5):
    olds.append(run(mine_triplets))
    news.append(run(new_form))
print("old:", [round(x,3) for x in olds], "best", round(min(olds),3), "mean", round(sum(olds)/5,3))
print("new:", [round(x,3) for x in news], "best", round(min(news),3), "mean", round(sum(news)/5,3))
