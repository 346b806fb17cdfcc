"""Property-based checks of the LLM-data operators against pure-Python
reference models: sequence packing bookkeeping, exact-substring span
accounting, and MinHash-LSH exact-duplicate recall — for arbitrary
generated corpora, not just the fixtures."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators import (
    corpus as CORPUS,
    dedup as D,
)

# lowercase words only: the operators lowercase + whitespace-split, so
# the reference model stays a trivial str.split
words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
texts = st.lists(words, min_size=1, max_size=30).map(" ".join)
docs_strategy = st.lists(texts, min_size=1, max_size=12)


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t, "s" + str(i % 2)) for i, t in enumerate(docs)],
        "doc_id long, text string, source string",
    )


@given(docs=docs_strategy, budget=st.sampled_from([4, 7, 16]))
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pack_concat_chunks_matches_reference(prop_spark, docs, budget):
    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_before"], r["pack_first"],
                      r["pack_last"], r["n_packs_spanned"])
        for r in CORPUS.pack_concat_chunks(_df(prop_spark, docs), budget=budget).collect()
    }
    # reference: per shard, docs laid end-to-end in doc_id order
    shards: dict[str, int] = {}
    for i, t in enumerate(docs):
        shard = "s" + str(i % 2)
        n = len(t.split(" "))
        cum = shards.get(shard, 0)
        first, last = cum // budget, (cum + n - 1) // budget
        assert got[i] == (n, cum, first, last, last - first + 1), (i, docs)
        shards[shard] = cum + n


@given(docs=docs_strategy)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_duplicated_ngram_spans_matches_reference(prop_spark, docs):
    n = 3
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"], r["n_tokens"])
        for r in CORPUS.duplicated_ngram_spans(
            _df(prop_spark, docs), n=n
        ).collect()
    }
    # reference: count n-gram occurrences corpus-wide, mark covered
    # token positions per doc, merge into spans
    from collections import Counter

    toks = [t.lower().split(" ") for t in docs]
    counts = Counter(
        tuple(tk[i: i + n]) for tk in toks for i in range(len(tk) - n + 1)
    )
    for d, tk in enumerate(toks):
        covered = set()
        for i in range(len(tk) - n + 1):
            if counts[tuple(tk[i: i + n])] > 1:
                covered.update(range(i, i + n))
        spans = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p > prev + 1:
                spans += 1
            prev = p
        assert got[d] == (spans, len(covered), len(tk)), (d, docs)


@given(docs=docs_strategy)
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lsh_always_recalls_exact_duplicates(prop_spark, docs):
    """Identical texts hash to identical signatures, so every exact-
    duplicate pair MUST surface as an LSH candidate (recall floor = 1.0
    for true duplicates, the property banding can never lose)."""
    # duplicate the first doc under new ids to guarantee exact dups
    df = prop_spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(docs)]
        + [(1000 + j, docs[0], "s") for j in range(2)],
        "doc_id long, text string, source string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in D.lsh_candidate_pairs(
            D.minhash_signature_mapside(df, "text", "doc_id"), "doc_id"
        ).collect()
    }
    dup_ids = [0] + [1000, 1001]
    dup_ids = [i for i in dup_ids] + [
        i for i, t in enumerate(docs) if t == docs[0] and i != 0
    ]
    for a in dup_ids:
        for b in dup_ids:
            if a < b:
                assert (a, b) in pairs, (a, b, sorted(pairs))


@given(docs=docs_strategy, pct=st.sampled_from([25, 40, 60]))
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_temperature_mixture_matches_reference(prop_spark, docs, pct):
    """T=2 mixture quotas and md5-ordered fills vs a pure-Python model:
    per-domain kept counts must match exactly for arbitrary corpora."""
    import hashlib
    import math

    got = {
        r["source"]: (r["n_total"], r["n_kept"], r["kept_pct"])
        for r in CORPUS.temperature_mixture_sample(
            _df(prop_spark, docs), target_frac_pct=pct
        ).collect()
    }
    by_dom: dict[str, list[int]] = {}
    for i, _t in enumerate(docs):
        by_dom.setdefault("s" + str(i % 2), []).append(i)
    total = len(docs)
    ssum = sum(math.sqrt(len(v)) for v in by_dom.values())
    for dom, ids in by_dom.items():
        # round-before-ceil, mirroring the operator's FP-noise guard
        quota = math.ceil(round(pct * total * math.sqrt(len(ids)) / (ssum * 100), 9))
        order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        kept = len(order[:quota])
        assert got[dom] == (len(ids), kept, kept * 100 // len(ids)), (dom, docs)


@given(docs=docs_strategy)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bigram_fluency_matches_reference(prop_spark, docs):
    """bigram_fluency vs a pure-Python model: identical integer scores
    for arbitrary corpora (the fixed-point arithmetic is the contract —
    any FP in the pipeline would drift off the model)."""
    from collections import Counter

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.text import (
        bigram_fluency,
    )

    got = {
        r["doc_id"]: (r["n_bigrams"], r["fluency_ppm"], r["min_ppm"])
        for r in bigram_fluency(_df(prop_spark, docs)).collect()
    }
    all_bigrams: Counter = Counter()
    per_doc: dict[int, list] = {}
    for i, t in enumerate(docs):
        toks = t.lower().split(" ")
        bgs = list(zip(toks, toks[1:]))
        per_doc[i] = bgs
        all_bigrams.update(bgs)
    prev_tot = Counter()
    for (p, _), c in all_bigrams.items():
        prev_tot[p] += c
    # V = continuation vocabulary: distinct token types seen as a
    # bigram continuation (matches the operator's pair_c-derived V)
    v = len({tok for (_, tok) in all_bigrams})
    for i, bgs in per_doc.items():
        if not bgs:
            assert i not in got
            continue
        fps = [
            (all_bigrams[bg] * 1_000_000) // (prev_tot[bg[0]] + v) for bg in bgs
        ]
        assert got[i] == (len(bgs), sum(fps) // len(bgs), min(fps)), (i, docs)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cc_driver_fast_path_equals_iterative(prop_spark, edges):
    """connected_components' small-graph union-find shortcut must label
    identically to the distributed pointer-jumping loop on arbitrary
    graphs (self-loops and duplicate edges included)."""
    df = prop_spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {
        (r["id"], r["cluster_id"])
        for r in D.connected_components(df).collect()
    }
    slow = {
        (r["id"], r["cluster_id"])
        for r in D.connected_components(df, driver_max_edges=0).collect()
    }
    assert fast == slow, edges
