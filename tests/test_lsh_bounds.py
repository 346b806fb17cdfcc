"""Hot-bucket bounds for the LSH pair generators (the 100 TB guard).

An adversarial corpus — many boilerplate-identical docs — lands every
doc in the SAME band bucket; an unbounded clique join would emit O(n²)
pairs on one shuffle partition. The bounded operators must instead
star-collapse oversized buckets to O(n) pairs while keeping the dup
cluster connected (every member reachable from the hub)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators import (
    dedup as D,
)

N_IDENTICAL = 1000


@pytest.fixture(scope="module")
def identical_docs(spark):
    text = "the same boilerplate navigation header footer text appears on every page"
    return spark.range(N_IDENTICAL).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    )


def test_hot_bucket_star_collapse_linear(spark, identical_docs):
    sigs = D.minhash_signature_mapside(identical_docs, "text", "doc_id")
    pairs = D.lsh_candidate_pairs(sigs, "doc_id", max_bucket=64)
    rows = pairs.collect()
    # O(n) output: hub (min id = 0) paired with each of the 999 others,
    # NOT the 499,500-pair clique.
    assert len(rows) == N_IDENTICAL - 1
    assert all(r["doc_a"] == 0 for r in rows)
    assert sorted(r["doc_b"] for r in rows) == list(range(1, N_IDENTICAL))
    # identical docs share all 4 bands
    assert all(r["n_bands"] == 4 for r in rows)


def test_small_buckets_still_clique(spark):
    # 10 identical docs, below the default cap: full clique expected
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("identical small cluster document body text").alias("text"),
    )
    sigs = D.minhash_signature_mapside(docs, "text", "doc_id")
    pairs = D.lsh_candidate_pairs(sigs, "doc_id", max_bucket=64)
    assert pairs.count() == 10 * 9 // 2


def test_bound_preserves_fixture_parity(spark, sf_dir):
    # on the real fixtures no bucket exceeds the cap, so the bounded
    # operator must be pair-for-pair identical to an effectively
    # unbounded run
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = D.minhash_signature_mapside(docs, "text", "doc_id")
    bounded = D.lsh_candidate_pairs(sigs, "doc_id", max_bucket=64)
    unbounded = D.lsh_candidate_pairs(sigs, "doc_id", max_bucket=10**9)
    assert bounded.exceptAll(unbounded).count() == 0
    assert unbounded.exceptAll(bounded).count() == 0


def test_embedding_hot_bucket_star_collapse(spark):
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries.llmops import (
        _embedding_neardup_build,
    )

    n = 600
    vec = [float(i % 7) - 3.0 for i in range(16)]
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(v) for v in vec]).alias("embedding"),
    ).createOrReplaceTempView("embeddings")
    try:
        out = _embedding_neardup_build(spark, None, max_bucket=256).collect()
        # identical vectors: cosine 1.0, one hot bucket -> star to hub 0
        assert len(out) == n - 1
        assert all(r["id_a"] == 0 and r["sim"] == 1.0 for r in out)
    finally:
        spark.catalog.dropTempView("embeddings")


def test_connected_components_rounds_logarithmic(spark):
    """A 100-node chain has diameter 99: plain min-label propagation
    needs 99 rounds, pointer jumping needs ~log2(99). max_iter=10 passes
    only because the shortcut step is doing its job — this pins the
    O(log diameter) round bound the 100 TB design depends on."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], ["doc_a", "doc_b"]
    )
    labels = connected_components(chain, max_iter=10).collect()
    assert len(labels) == 100
    assert all(r["cluster_id"] == 0 for r in labels)


def test_pair_broadcast_gate_parity(spark, monkeypatch):
    """The verify-stage pair-list broadcast is gated on a counted row
    bound (round-17: an unconditional broadcast of a corpus-scale pair
    list would hit the 8 GB broadcast cap at 100 TB). Forcing the gate
    shut must route both verify entry points through the distributed
    fallback with identical results."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators import (
        dedup as D,
    )

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared boilerplate text body padding padding padding "),
            (F.col("id") % 5).cast("string"),
        ).alias("text"),
    )
    sh = D.char_shingles(docs, "text", "doc_id")
    sigs = D.minhash_signature_mapside(docs, "text", "doc_id")
    cands = D.lsh_candidate_pairs(sigs, "doc_id")

    broad_v = sorted(map(tuple, D.jaccard_verify(sh, cands, "doc_id").collect()))
    broad_d = sorted(
        map(tuple, D.jaccard_verify_docs(docs, cands, "text", "doc_id").collect())
    )
    assert broad_v, "fixture produced no verified pairs"

    monkeypatch.setattr(D, "_PAIR_BROADCAST_MAX_ROWS", 0)
    dist_v = sorted(map(tuple, D.jaccard_verify(sh, cands, "doc_id").collect()))
    dist_d = sorted(
        map(tuple, D.jaccard_verify_docs(docs, cands, "text", "doc_id").collect())
    )
    assert broad_v == dist_v
    assert broad_d == dist_d
