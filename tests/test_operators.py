"""Unit semantics for the custom operators (asof, dedup, similarity,
multimodal plumbing) on tiny hand-built frames."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.asof import (
    asof_join,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.dedup import (
    char_shingles,
    connected_components,
    exact_dedup,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signature,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    frame_sample,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.similarity import (
    cosine_topk,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T12:00:00"), 101),
            (2, _ts("2024-01-01T09:00:00"), 102),  # no prior quote
            (1, _ts("2024-01-01T11:00:00"), 103),  # equal-ts quote applies (<=)
        ],
        "user_id int, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 9.5),
            (1, _ts("2024-01-01T11:00:00"), 11.0),
            (2, _ts("2024-01-01T10:00:00"), 20.0),
        ],
        "user_id int, ts timestamp, px double",
    )
    out = asof_join(trades, quotes, ["user_id"], "ts", "ts", ["px"])
    got = {r["trade_id"]: r["asof_px"] for r in out.collect()}
    assert got == {100: 9.5, 101: 11.0, 102: None, 103: 11.0}

    # tolerance (pandas merge_asof parity): a match staler than the
    # bound is discarded, an exact-boundary match survives (<=)
    out = asof_join(
        trades, quotes, ["user_id"], "ts", "ts", ["px"],
        tolerance=1800.0,
    )
    got = {r["trade_id"]: r["asof_px"] for r in out.collect()}
    # trade 100 at 10:00: quote 09:30 is exactly 1800s old -> kept;
    # trade 101 at 12:00: quote 11:00 is 3600s old -> dropped;
    # trade 103 at 11:00: equal-ts quote (0s) -> kept
    assert got == {100: 9.5, 101: None, 102: None, 103: 11.0}


def test_asof_join_null_in_matched_row_not_backfilled(spark):
    """Timestamp and values must come from the SAME matched right row
    (round-9 advice): when the latest right row holds NULL in a value
    column, the result is that row's NULL (pandas merge_asof parity),
    never a value backfilled from an earlier right row — and the
    staleness bound is evaluated against the matched row's timestamp,
    not a stale carrier's."""
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), 200)],
        "user_id int, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 9.0, "early"),
            (1, _ts("2024-01-01T11:59:00"), None, "late"),  # matched row
        ],
        "user_id int, ts timestamp, px double, src string",
    )
    out = asof_join(trades, quotes, ["user_id"], "ts", "ts", ["px", "src"])
    row = out.collect()[0]
    # the matched (latest) row's NULL px stays NULL; src proves which
    # row matched — the pre-fix per-column carry returned (9.0, "late")
    assert row["asof_px"] is None and row["asof_src"] == "late"

    # with a 5-minute tolerance the matched row (60s old) is in bounds;
    # the pre-fix carrier would have attached early's 3h-old px anyway
    out = asof_join(
        trades, quotes, ["user_id"], "ts", "ts", ["px", "src"],
        tolerance=300.0,
    )
    row = out.collect()[0]
    assert row["asof_px"] is None and row["asof_src"] == "late"


def test_asof_join_directions(spark):
    """direction= (pandas merge_asof parity): forward matches the
    earliest right row at-or-after, nearest picks the closer side with
    equidistant ties going backward, and tolerance bounds the absolute
    time distance in every direction."""
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T09:45:00"), 101),  # equidistant tie
            (1, _ts("2024-01-01T11:30:00"), 102),  # no later quote
        ],
        "user_id int, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 9.0),
            (1, _ts("2024-01-01T10:30:00"), 10.5),
            (1, _ts("2024-01-01T11:00:00"), 11.0),
        ],
        "user_id int, ts timestamp, px double",
    )

    fwd = asof_join(
        trades, quotes, ["user_id"], "ts", "ts", ["px"], direction="forward"
    )
    got = {r["trade_id"]: r["asof_px"] for r in fwd.collect()}
    # 100 -> first quote >= 10:00 is 10:30; 102 has none after 11:30
    assert got == {100: 10.5, 101: 10.5, 102: None}

    near = asof_join(
        trades, quotes, ["user_id"], "ts", "ts", ["px"], direction="nearest"
    )
    got = {r["trade_id"]: r["asof_px"] for r in near.collect()}
    # 100: 10:30 (30m) beats 09:00 (60m); 101: equidistant 09:00/10:30
    # -> backward (9.0); 102: only backward exists
    assert got == {100: 10.5, 101: 9.0, 102: 11.0}

    near_tol = asof_join(
        trades, quotes, ["user_id"], "ts", "ts", ["px"],
        direction="nearest", tolerance=600.0,
    )
    got = {r["trade_id"]: r["asof_px"] for r in near_tol.collect()}
    # nothing within 10 minutes of 10:00 or 09:45; 11:00 is 30m from 11:30
    assert got == {100: None, 101: None, 102: None}

    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, ["user_id"], "ts", "ts", ["px"],
                  direction="sideways")


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "aa"), (1, "aa"), (2, "bb"), (5, "aa")], "doc_id int, text string"
    )
    out = exact_dedup(df, ["text"], "doc_id").collect()
    assert sorted((r["doc_id"], r["text"]) for r in out) == [(1, "aa"), (2, "bb")]


def test_exact_dedup_null_ids_never_lose_content(spark):
    """A NULL id loses to any non-null id, but a group whose EVERY id
    is NULL must still keep one row — dedup reduces duplicates, it
    never loses content (round-10 advice: min() ignores NULLs and the
    equi-semi-join dropped such groups entirely). Group cols that are
    themselves NULL form a group too (null-safe anti-join)."""
    df = spark.createDataFrame(
        [
            (1, "aa"), (2, "aa"),  # normal group: keep min id 1
            (None, "aa"),           # NULL dup of a keyed group: dropped
            (None, "bb"), (None, "bb"),  # all-NULL-id group: keep ONE
            (5, "cc"),
            (None, None), (None, None),  # NULL group key, all-NULL ids
        ],
        "doc_id int, text string",
    )
    out = exact_dedup(df, ["text"], "doc_id").collect()
    got = sorted(
        ((r["doc_id"] if r["doc_id"] is not None else -1), r["text"] or "")
        for r in out
    )
    assert got == [(-1, ""), (-1, "bb"), (1, "aa"), (5, "cc")]


def test_minhash_identical_docs_always_candidates(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different content about spark catalyst optimizer internals"),
        ],
        "doc_id long, text string",
    )
    sh = char_shingles(df, "text", "doc_id")
    pairs = lsh_candidate_pairs(minhash_signature(sh, "doc_id"), "doc_id").collect()
    assert [(r["doc_a"], r["doc_b"], r["n_bands"]) for r in pairs] == [(1, 2, 4)]
    verified = jaccard_verify(
        sh, spark.createDataFrame([(1, 2)], "doc_a long, doc_b long"), "doc_id"
    ).collect()
    assert verified[0]["jaccard"] == 1.0


def test_cosine_topk_orders_by_similarity(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.1]),   # closest to 0
            (2, [0.0, 1.0]),   # orthogonal
            (3, [-1.0, 0.0]),  # opposite
        ],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(df, [0], k=3).collect()
    assert [r["vec_id_n"] for r in out] == [1, 2, 3]
    assert out[0]["sim"] > 0.99 and out[1]["sim"] == 0.0 and out[2]["sim"] == -1.0


def test_ivf_topk_neighbors_from_probed_cells(spark):
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.similarity import (
        ivf_topk,
    )

    # two tight clusters; centroids = vectors 0 and 1 (one per cluster)
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [1.0, 0.05]),   # cluster of 0
            (3, [0.05, 1.0]),   # cluster of 1
            (4, [1.0, -0.05]),  # cluster of 0
        ],
        "vec_id long, embedding array<float>",
    )
    out = ivf_topk(df, [0], k=2, n_centroids=2, nprobe=1).collect()
    assert [r["vec_id_n"] for r in out] == [2, 4]
    assert all(r["cell"] == 1 for r in out)


def test_kmeans_fit_matches_numpy_reference(spark, sf_dir):
    """Lloyd's k-means on Spark must equal a NumPy implementation of the
    IDENTICAL algorithm (same lowest-id init, 6-dp distance rounding,
    first-min tie-break, 6-dp centroid rounding per iteration) — pinning
    that the distributed assign/update introduces no drift."""
    import numpy as np

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.similarity import (
        kmeans_fit,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources.catalog import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    X = np.array([[float(v) for v in r["embedding"]] for r in rows], dtype=np.float64)
    k, iters = 4, 3

    cents = np.round(X[:k].copy(), 6)
    for _ in range(iters):
        d = np.round(((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6)
        cell = d.argmin(axis=1)  # first-min tie-break, like array_position
        new = cents.copy()
        for c in range(k):
            members = X[cell == c]
            if len(members):
                new[c] = np.round(members.mean(axis=0), 6)
        if (new == cents).all():
            break
        cents = new

    got = kmeans_fit(emb, k=k, iters=iters)
    assert np.allclose(np.array(got), cents, atol=1e-9)


def test_ivf_topk_accepts_trained_centroids(spark):
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.similarity import (
        ivf_topk,
        kmeans_fit,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [1.0, 0.05]),
            (3, [0.05, 1.0]),
            (4, [1.0, -0.05]),
        ],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_fit(df, k=2, iters=3)
    assert len(cents) == 2 and len(cents[0]) == 2
    out = ivf_topk(df, [0], k=2, nprobe=1, centroids=cents).collect()
    # trained centroids converge to the two clusters -> same neighbors
    assert [r["vec_id_n"] for r in out] == [2, 4]


def test_pq_topk_validates_and_ranks(spark):
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.similarity import (
        pq_topk,
    )

    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 0.0, 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    out = pq_topk(df, [7], k=3, m=2, n_codes=4).collect()
    assert len(out) == 3
    assert [r["rn"] for r in out] == [1, 2, 3]
    assert all(r["qid"] == 7 and r["vec_id_n"] != 7 for r in out)
    # ADC is non-decreasing in rank
    assert out[0]["adc"] <= out[1]["adc"] <= out[2]["adc"]
    with pytest.raises(ValueError):
        pq_topk(df, [7], m=3)  # dim 4 not divisible
    with pytest.raises(ValueError):
        pq_topk(df, [7], n_codes=100)  # not enough codebook vectors


def test_ivf_topk_survives_real_centroid_counts(spark, sf_dir):
    """256 centroids x 64 dims must plan and run without codegen blowup —
    the centroid set is broadcast DATA, not an inlined literal expression
    (round-2 verdict: a literal tree of k*dim constants breaks Janino
    long before data size matters)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.similarity import (
        ivf_topk,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources.catalog import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(
        emb, query_ids=[0, 1, 2], k=3, n_centroids=256, nprobe=4
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
        assert 1 <= r["cell"] <= 256
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        assert 1 <= len(rows) <= 3
        assert [r["rn"] for r in rows] == list(range(1, len(rows) + 1))


def test_multimodal_plumbing_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], "doc_id long, text string"
    )
    mm = attach_binary_payload(docs)
    # binary column survives a parquet round-trip
    p = str(tmp_path / "mm")
    mm.write.parquet(p)
    back = spark.read.parquet(p)
    assert dict(back.dtypes)["payload"] == "binary"
    decoded = decode_features(back).orderBy("doc_id").collect()
    assert decoded[0]["n_bytes"] == len("hello world")
    assert decoded[0]["width"] == len("hello world") % 64 + 1
    frames = frame_sample(decode_features(back)).collect()
    assert all(r["frame_idx"] == 0 for r in frames)


def test_multimodal_null_payloads_in_contract(spark):
    """NULL text -> NULL payload (encode(NULL)=NULL): every decoder
    takes it in stride instead of crashing the stage (review round 11,
    matching the sibling text/corpus NULL contract). Per-doc operators
    emit NULL metrics; frame/window exploders emit zero rows; and
    frame_sample survives n_frames=0 or NULL (the 0..-1 sequence used
    to abort the whole job)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.multimodal import (
        attach_binary_payload,
        audio_window_energy,
        decode_features,
        frame_sample,
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "")], "doc_id long, text string"
    )
    mm = attach_binary_payload(docs)

    dec = {r["doc_id"]: r for r in decode_features(mm).collect()}
    assert set(dec) == {1, 2, 3}  # per-doc cardinality holds
    assert dec[2]["width"] is None and dec[2]["n_frames"] is None
    assert dec[3]["n_bytes"] == 0 and dec[3]["width"] == 1

    # n_frames NULL (doc 2) -> zero frames, no crash; and an explicit
    # n_frames=0 row must also emit nothing
    frames = frame_sample(decode_features(mm)).collect()
    assert {r["doc_id"] for r in frames} == {1, 3}
    zero = spark.createDataFrame(
        [(9, 4, 4, 0)], "doc_id long, width int, height int, n_frames int"
    )
    assert frame_sample(zero).count() == 0

    assert {r["doc_id"] for r in sample_frames(mm).collect()} == {1}
    assert {r["doc_id"] for r in audio_window_energy(mm).collect()} == {1}
    rz = {r["doc_id"]: r for r in resize_images(mm).collect()}
    assert set(rz) == {1, 2, 3}
    assert rz[2]["content_md5"] is None and rz[2]["n_bytes"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="scale"):
        resize_images(mm, scale=0)
    with _pytest.raises(ValueError, match="every_n"):
        frame_sample(zero, every_n=0)


def test_salted_join_guards_and_spread(spark):
    """salted_join: (a) matches the plain inner/left joins exactly,
    (b) REJECTS right/full outer (right-side replication would emit one
    null-extended row per unmatched right COPY — empirically 3 rows
    became 9), and (c) spreads byte-identical hot-key rows over
    multiple salts (the whole-row hash gave them all one salt)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.skew import (
        _row_spread_salt,
        salted_join,
        salted_sum,
    )

    left = spark.createDataFrame(
        [(1, "x")] * 50 + [(2, "y"), (3, "z")], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(1, "r1"), (2, "r2"), (4, "r4")], "k long, rv string"
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = salted_join(left, right, on=["k"], how=how, n_salts=8)
        want = left.join(right, on=["k"], how=how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"salted {how} join diverged from the plain join"

    import pytest as _pytest

    for bad in ("right", "full", "outer", "right_outer", "full_outer"):
        with _pytest.raises(ValueError, match="salt-safe"):
            salted_join(left, right, on=["k"], how=bad)

    # n_salts < 1 fails loudly: sequence(0, -1) DESCENDS, so a zero
    # salt count would replicate right rows under salts [0, -1] instead
    # of erroring (round-14 review sweep)
    for bad_n in (0, -3):
        with _pytest.raises(ValueError, match="n_salts"):
            salted_join(left, right, on=["k"], n_salts=bad_n)
        with _pytest.raises(ValueError, match="n_salts"):
            salted_sum(left, ["k"], "v", n_salts=bad_n)

    # identical hot-key rows spread across salts (>1 distinct salt over
    # 50 byte-identical rows; the old whole-row hash gave exactly 1)
    n_salts = left.repartition(4).withColumn(
        "__salt", _row_spread_salt(8)
    ).select("__salt").distinct().count()
    assert n_salts > 1

    # salted_sum equals the plain aggregation even when the hot key's
    # value is CONSTANT (the value-hash salt had zero spread there)
    df = spark.createDataFrame([(1, 10)] * 40 + [(2, 5)], "k long, v long")
    got = {r["k"]: (r["sum_v"], r["cnt"]) for r in salted_sum(df, ["k"], "v").collect()}
    assert got == {1: (400, 40), 2: (5, 1)}

    # salt_cols opt-in (nondeterministic-input sources, round-11
    # advice): content salt is recompute-stable AND still spreads when
    # the named column varies within the hot key
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.skew import (
        _content_salt,
    )

    varied = spark.createDataFrame(
        [(1, i) for i in range(40)] + [(2, 5)], "k long, v long"
    )
    got2 = {
        r["k"]: (r["sum_v"], r["cnt"])
        for r in salted_sum(varied, ["k"], "v", salt_cols=["v"]).collect()
    }
    assert got2 == {1: (sum(range(40)), 40), 2: (5, 1)}
    spread = (
        varied.withColumn("__salt", _content_salt(["v"], 8))
        .filter(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread > 1
    got3 = salted_join(left, right, on=["k"], how="inner", salt_cols=["lv"])
    want3 = left.join(right, on=["k"], how="inner")
    assert sorted(map(tuple, got3.collect())) == sorted(map(tuple, want3.collect()))


def test_connected_components_semantics(spark):
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.dedup import (
        connected_components,
    )

    # chain 0-1-2-...-9 (diameter 9: exercises pointer jumping),
    # star 100-{101,102,103}, isolated pair 200-201
    pairs = (
        [(i, i + 1) for i in range(9)]
        + [(100, 101), (100, 102), (100, 103)]
        + [(200, 201)]
    )
    df = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    got = {
        (r["id"], r["cluster_id"])
        for r in connected_components(df).collect()
    }
    want = (
        {(i, 0) for i in range(10)}
        | {(i, 100) for i in (100, 101, 102, 103)}
        | {(200, 200), (201, 200)}
    )
    assert got == want


def test_connected_components_empty_and_converged(spark):
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.dedup import (
        connected_components,
    )

    empty = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert connected_components(empty).count() == 0
    # already-minimal labels converge in one round
    one = spark.createDataFrame([(5, 6)], ["doc_a", "doc_b"])
    rows = dict(
        (r["id"], r["cluster_id"]) for r in connected_components(one).collect()
    )
    assert rows == {5: 5, 6: 5}


def test_connected_components_releases_dead_checkpoint_generations(spark):
    """Block hygiene (r7 verdict task 5): each round's localCheckpoint
    supersedes the previous label generation, and superseded blocks
    must be unpersisted immediately — letting every generation pile up
    until RDD GC drove a ~1.1 s JVM GC tail on the bench. After the
    call, at most ONE new persistent RDD (the returned final label
    checkpoint) may remain; the edge relation, the input pairs, and
    every intermediate generation must be gone."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.dedup import (
        connected_components,
    )

    jsc = spark.sparkContext._jsc

    def pids():
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    # diameter-9 chain: multiple propagation rounds, multiple generations
    df = spark.createDataFrame([(i, i + 1) for i in range(9)], ["doc_a", "doc_b"])
    before = pids()
    out = connected_components(df, driver_max_edges=0)  # force distributed
    out.count()
    leaked = pids() - before
    assert len(leaked) <= 1, (
        f"{len(leaked)} persistent RDDs left behind — dead checkpoint "
        "generations are not being released"
    )

    # the driver fast path must release the input checkpoint too
    before = pids()
    connected_components(df).count()
    assert len(pids() - before) == 0


def test_repetition_metrics_edges(spark):
    """Single-token doc (no bigrams), fully-repeated doc, healthy doc —
    counts and the integer keep flag behave at the boundaries."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.text import (
        repetition_metrics,
    )

    docs = spark.createDataFrame(
        [
            (1, "word"),                       # 1 token, 0 bigrams
            (2, "spam spam spam spam spam"),   # pure repetition
            (3, "the quick brown fox jumps"),  # all distinct
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert rows[1]["n_tokens"] == 1 and rows[1]["n_bigrams"] == 0
    assert rows[1]["top_bigram_n"] == 0 and rows[1]["keep"] == 1
    assert rows[2]["distinct_tokens"] == 1 and rows[2]["top_token_n"] == 5
    assert rows[2]["top_bigram_n"] == 4 and rows[2]["keep"] == 0
    assert rows[3]["distinct_tokens"] == 5 and rows[3]["keep"] == 1


def test_ngram_overlap_counts_and_flag(spark):
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.text import (
        ngram_overlap_vs_benchmark,
    )

    bench = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),        # full overlap -> contaminated
            (2, "x y z w v"),        # zero overlap
            (3, "q r a b c s t"),    # exactly one shared 3-gram "a b c"
            (4, "xy"),               # < 3 tokens -> no grams, excluded
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_overlap_vs_benchmark(corpus, bench).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_overlap"] == 3 and rows[1]["contaminated"] == 1
    assert rows[2]["n_overlap"] == 0 and rows[2]["contaminated"] == 0
    assert rows[3]["n_ngrams"] == 5 and rows[3]["n_overlap"] == 1
    assert rows[3]["contaminated"] == 1  # 1/5 = 20% >= 5%


def test_resize_images_content_and_clamp(spark):
    """Resized bytes are the strided slice of the payload (md5-pinned
    against hashlib) and 1-pixel dims clamp instead of hitting zero."""
    import hashlib

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.multimodal import (
        attach_binary_payload,
        resize_images,
    )

    # len 63 -> width 63%64+1=64 -> new 32; len 1 ('x') -> width 2 -> new 1
    docs = spark.createDataFrame(
        [(1, "a" * 63), (2, "x")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in resize_images(attach_binary_payload(docs)).collect()}
    assert rows[1]["width"] == 64 and rows[1]["new_width"] == 32
    assert rows[1]["n_bytes"] == 32
    assert rows[1]["content_md5"] == hashlib.md5((b"a" * 63)[::2]).hexdigest()
    assert rows[2]["new_width"] >= 1 and rows[2]["new_height"] >= 1
    assert rows[2]["content_md5"] == hashlib.md5(b"x").hexdigest()


def test_pack_concat_chunks_boundaries(spark):
    """Concat-and-chunk packing: exact pack indices at the budget
    boundary, including a doc that exactly fills a pack and a doc
    spanning three packs."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.corpus import (
        pack_concat_chunks,
    )

    mk = lambda n: " ".join(["w"] * n)  # noqa: E731
    docs = spark.createDataFrame(
        [
            (1, "s1", mk(10)),   # packs 0..0
            (2, "s1", mk(54)),   # fills pack 0 exactly (10+54=64)
            (3, "s1", mk(129)),  # tokens 64..192 -> packs 1..3 (3 spanned)
            (4, "s2", mk(64)),   # independent shard: packs 0..0
        ],
        "doc_id long, source string, text string",
    )
    rows = {r["doc_id"]: r for r in pack_concat_chunks(docs, budget=64).collect()}
    assert (rows[1]["pack_first"], rows[1]["pack_last"]) == (0, 0)
    assert (rows[2]["pack_first"], rows[2]["pack_last"]) == (0, 0)
    assert rows[2]["cum_before"] == 10
    assert (rows[3]["pack_first"], rows[3]["pack_last"]) == (1, 3)
    assert rows[3]["n_packs_spanned"] == 3
    assert (rows[4]["pack_first"], rows[4]["pack_last"]) == (0, 0)


def test_duplicated_ngram_spans_merge_and_intra_doc(spark):
    """Span semantics: overlapping duplicate grams merge into one span;
    an intra-document repeat counts as duplicated (Lee et al. suffix
    semantics); a clean doc reports zero."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.corpus import (
        duplicated_ngram_spans,
    )

    shared = "a b c d"  # the duplicated 4-token phrase
    docs = spark.createDataFrame(
        [
            (1, f"{shared} x y z w"),      # tokens 0-3 duplicated vs doc 2
            (2, f"p q r s {shared}"),      # tokens 4-7 duplicated vs doc 1
            (3, "k l m n o k l m n o"),    # intra-doc repeat of k l m n
            (4, "u1 u2 u3 u4 u5 u6 u7 u8"),  # unique
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicated_ngram_spans(docs, n=4).collect()}
    assert rows[1]["n_dup_spans"] == 1 and rows[1]["dup_tokens"] == 4
    assert rows[2]["n_dup_spans"] == 1 and rows[2]["dup_tokens"] == 4
    # "k l m n" occurs at pos 0 and 5; also "l m n o" at 1 and 6, etc.
    # all merge into one span covering the whole 10-token doc
    assert rows[3]["n_dup_spans"] == 1 and rows[3]["dup_tokens"] == 10
    assert rows[3]["dup_frac_pct"] == 100
    assert rows[4]["n_dup_spans"] == 0 and rows[4]["dup_tokens"] == 0


def test_temperature_mixture_flattens_domains(spark):
    """T=2 sampling: the small domain keeps a LARGER fraction than the
    big one (sqrt flattening), quotas cap at the domain size, and the
    selection is deterministic."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.corpus import (
        temperature_mixture_sample,
    )

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["source"]: r
        for r in temperature_mixture_sample(docs, target_frac_pct=40).collect()
    }
    assert got["big"]["n_total"] == 90 and got["small"]["n_total"] == 10
    assert got["small"]["kept_pct"] > got["big"]["kept_pct"]
    assert got["big"]["n_kept"] <= 90 and got["small"]["n_kept"] <= 10
    # deterministic under re-run
    again = {
        r["source"]: r["n_kept"]
        for r in temperature_mixture_sample(docs, target_frac_pct=40).collect()
    }
    assert again == {k: v["n_kept"] for k, v in got.items()}


def test_rare_token_fraction_corpus_relative(spark):
    """Rarity is CORPUS-wide, not per-doc: a token common across docs is
    never rare even if it appears once in a given doc."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.text import (
        rare_token_fraction,
    )

    docs = spark.createDataFrame(
        [
            (1, "common common weird1"),   # 'common' x5 corpus-wide
            (2, "common common common"),
            (3, "weird2 weird3"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in rare_token_fraction(docs, rare_max_count=2).collect()}
    assert rows[1]["n_tokens"] == 3 and rows[1]["n_rare"] == 1
    assert rows[2]["n_rare"] == 0
    assert rows[3]["n_rare"] == 2 and rows[3]["rare_pct"] == 100


def test_bigram_fluency_matches_duckdb_and_orders_quality(spark):
    """bigram_fluency (KenLM-filter analogue, integer-exact): values
    must match an independent DuckDB formulation bit-for-bit (the whole
    point of fixed-point over log-space), and templated text must
    outscore shuffled text."""
    import duckdb

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.text import (
        bigram_fluency,
    )

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["fluency_ppm"], r["min_ppm"])
        for r in bigram_fluency(docs).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{os.path.join(sf, 'documents.parquet')}'"
    )
    rows = con.execute("""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
         generate_subscripts(string_split(lower(text), ' '), 1) AS ord
  FROM documents
),
bigrams AS (
  SELECT doc_id, lag(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS prev, tok
  FROM toks
),
bg AS (SELECT * FROM bigrams WHERE prev IS NOT NULL),
pair_c AS (SELECT prev, tok, COUNT(*) AS cp FROM bg GROUP BY prev, tok),
prev_c AS (SELECT prev, SUM(cp) AS cv FROM pair_c GROUP BY prev),
v AS (SELECT COUNT(DISTINCT tok) AS vn FROM pair_c)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM((cp * 1000000) // (cv + vn)) // COUNT(*) AS BIGINT) AS fluency_ppm,
       CAST(MIN((cp * 1000000) // (cv + vn)) AS BIGINT) AS min_ppm
FROM bg JOIN pair_c USING (prev, tok) JOIN prev_c USING (prev) CROSS JOIN v
GROUP BY doc_id
""").fetchall()
    want = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert got == want

    # direction check: repeated template >> word salad, same vocabulary
    probe = spark.createDataFrame(
        [
            (1, "the cat sat on the mat " * 8),
            (2, "mat the on sat mat cat the sat on cat the mat on the sat cat"),
        ],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["fluency_ppm"] for r in bigram_fluency(probe).collect()}
    assert scores[1] > scores[2]


def test_bigram_fluency_tokenizes_corpus_exactly_once(spark):
    """The shared bigram subtree must be materialized (r7 verdict #1):
    three consumers (pair counts, V, scoring join) previously re-ran
    the posexplode+window over the full corpus once each. With the
    checkpoint, the consumer plan contains NO Generate (posexplode)
    node at all — tokenization happened exactly once, eagerly, into
    the checkpointed bigram relation."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.text import (
        bigram_fluency,
    )

    from conftest import SF_DIR

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = (
        bigram_fluency(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan, (
        "tokenization leaked into the consumer plan — the bigram "
        "checkpoint is not being reused"
    )


def test_bigram_fluency_release_hook_frees_checkpoints(spark):
    """bigram_fluency pins two localCheckpoints the returned plan
    references (it cannot self-release); release_checkpoints(result)
    must free exactly those blocks after the caller consumes the
    result, and be a no-op on unadorned DataFrames (r8 advice —
    long-lived sessions otherwise accumulate corpus-scale blocks)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.text import (
        bigram_fluency,
        release_checkpoints,
    )

    jsc = spark.sparkContext._jsc
    before = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    res = bigram_fluency(docs)
    assert res.count() == 5
    mid = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    assert len(mid - before) == 2, "expected the two pinned checkpoints"
    release_checkpoints(res)
    after = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    assert after - before == set(), "release must free both checkpoints"
    # no attachments + empty registry: silent no-op (drain first — other
    # suite tests may have left registry entries, which would warn)
    release_checkpoints(None)
    release_checkpoints(docs)


def test_release_checkpoints_warns_on_derived_frame(spark):
    """Calling release_checkpoints on a DERIVED frame (attachment lost
    on transformation) releases nothing — it must warn while pins
    remain, and release_checkpoints(None) must then drain the registry
    without holding DataFrame references (round-10 advice)."""
    import pytest as _pytest

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators import (
        text as text_mod,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.text import (
        bigram_fluency,
        release_checkpoints,
    )

    release_checkpoints(None)  # clean slate
    jsc = spark.sparkContext._jsc
    before = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    docs = spark.createDataFrame(
        [(i, "the dog ran to the dog") for i in range(4)],
        "doc_id long, text string",
    )
    res = bigram_fluency(docs)
    assert res.count() == 4
    derived = res.orderBy("doc_id")  # attachment does not survive this
    with _pytest.warns(UserWarning, match="DERIVED"):
        release_checkpoints(derived)
    # the registry stores (session, rdd-id) pairs, never DataFrames
    assert all(isinstance(rid, int) for _, rid in text_mod._LIVE_CHECKPOINTS)
    release_checkpoints(None)
    assert text_mod._LIVE_CHECKPOINTS == []
    after = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    assert after - before == set(), "drain must free the pinned blocks"


def test_compression_ratio_pins_zlib_and_orders_redundancy(spark):
    """compression_ratio must equal direct zlib calls byte-for-byte
    (same stdlib on driver and executor) and order boilerplate below
    natural-ish prose."""
    import zlib

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.text import (
        compression_ratio,
    )

    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "the quick brown fox jumps over one lazy dog near a river bank"),
        (3, ""),  # empty doc: defined ratio, no divide-by-zero
        (4, "\u6df1\u5ea6\u5b66\u4e60\u6a21\u578b " * 4),  # multibyte
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for doc_id, text in rows:
        raw = text.encode("utf-8")
        z = len(zlib.compress(raw, 6))
        assert got[doc_id]["n_bytes_zlib"] == z
        assert got[doc_id]["n_bytes_raw"] == len(raw)
        assert got[doc_id]["ratio_pm"] == z * 1000 // max(len(raw), 1)
    assert got[1]["ratio_pm"] < got[2]["ratio_pm"]


def test_connected_components_drops_null_endpoint_edges(spark):
    """A NULL endpoint names no entity: such edges are dropped uniformly
    before either path — the distributed label joins silently lost
    NULL-keyed edges and split components that routed through them
    (review round 10); both paths now agree by construction."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, None), (None, 9), (8, 9)], "doc_a int, doc_b int"
    )
    for cap in (0, 100):  # 0 forces the distributed path
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(
                pairs, driver_max_edges=cap or None
            ).collect()
            if cap or True
        }
        assert got == {1: 1, 2: 1, 8: 8, 9: 8}, cap


def test_exact_dedup_plan_uses_partial_aggregation(spark):
    """exact_dedup is ONE min_by aggregate (round 17) — duplicates
    collapse map-side via partial_min_by before the single cols-keyed
    shuffle — not a full-row window shuffle and not the old
    groupBy + semi-join-back (which paid two extra corpus shuffles)."""
    df = spark.createDataFrame(
        [(3, "aa"), (1, "aa"), (2, "bb")], "doc_id int, text string"
    )
    out = exact_dedup(df, ["text"], "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min_by" in plan


def test_udfs_null_inputs_in_contract(spark):
    """quality_score_udf scores NULL text as NULL (len(set(None)) used
    to TypeError the whole job), and weighted_avg_price_udaf skips
    NULL pairs like a SQL aggregate (NaN->int64 silently produced
    INT64_MIN, corrupting the average) — review round 11."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.functions.udfs import (
        quality_score_udf,
        weighted_avg_price_udaf,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], "id long, text string"
    )
    rows = {r["id"]: r["s"] for r in docs.select(
        "id", quality_score_udf(F.col("text")).alias("s")
    ).collect()}
    assert rows[2] is None
    assert rows[1] is not None

    pr = spark.createDataFrame(
        [("g", 10.0, 2.0), ("g", None, 3.0), ("g", 20.0, None), ("g", 20.0, 2.0)],
        "k string, ep double, qty double",
    )
    got = pr.groupBy("k").agg(
        weighted_avg_price_udaf("ep", "qty").alias("w")
    ).collect()[0]["w"]
    # only the two complete pairs count: (10*2 + 20*2) / 4 = 15.0
    assert got == 15.0


def test_salted_empty_salt_cols_is_an_error(spark):
    """An explicitly-passed EMPTY salt_cols must raise, not silently
    fall back to the recompute-unsafe position salt the caller opted
    out of (review round 12)."""
    import pytest as _pytest

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.skew import (
        salted_join,
        salted_sum,
    )

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with _pytest.raises(ValueError, match="salt_cols is empty"):
        salted_sum(df, ["k"], "v", salt_cols=[])
    with _pytest.raises(ValueError, match="salt_cols is empty"):
        salted_join(df, df, on=["k"], salt_cols=[])


def test_exact_dedup_duplicate_and_reused_ids(spark):
    """The keeper semi-join must match on (cols, id), not id alone: an
    exactly-replayed keeper row collapses to ONE output row, and a
    keeper id VALUE reused in a different group must not smuggle that
    group's non-keeper row through (review round 12)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.dedup import (
        exact_dedup,
    )

    # at-least-once replay: same (id, text) delivered twice
    df = spark.createDataFrame(
        [(7, "x"), (7, "x"), (8, "y")], "doc_id int, text string"
    )
    out = sorted(map(tuple, exact_dedup(df, ["text"], "doc_id").collect()))
    assert out == [(7, "x"), (8, "y")]

    # id 2 is the keeper of group 'bb' AND appears in group 'aa' whose
    # keeper is 1 — the (2, 'aa') row must be dropped
    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (2, "aa")], "doc_id int, text string"
    )
    out = sorted(map(tuple, exact_dedup(df, ["text"], "doc_id").collect()))
    assert out == [(1, "aa"), (2, "bb")]
