"""Similarity search over embedding columns (NORTH-STAR tier).

Brute-force top-k cosine is the exact baseline: the (small) query set is
broadcast against the corpus, the dot product is a JVM-side
zip_with/aggregate fold (no Python, no shuffle of the corpus), and the
top-k is a per-query window. Cost O(|corpus| * |queries| * dim) — at
100 TB this is the *verification* path.

The scale path is LSH bucketing (``lsh_bucket_topk``): an 8-bit
sign-of-leading-dims bucket restricts candidates to the query's bucket
(~1/256 of the corpus for centered data) — the same
partition-pruning idea an IVF index applies, expressed as an equi-join
so Spark shuffles by bucket instead of replicating the corpus.

Determinism for the oracle: similarities are ranked on ROUND(cos, 6)
with vec_id tiebreak, so float noise below 1e-6 cannot reorder results
across engines (all arithmetic is double on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_product(a, b):
    """Sequential-fold double dot product over two array columns —
    public: the embedding near-dup spec composes it too (a sequential
    fold keeps the summation order engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_dot = dot_product  # internal alias, original spelling


def _norm(a):
    return F.sqrt(_dot(a, a))


def _l2sq_rounded(a, b):
    """Squared L2 distance, rounded to 6 dp BEFORE any argmin — the one
    determinism contract shared by the kmeans trainer, the ivf assigner
    it feeds, and the pq encoder (a precision change desynchronizing
    them would silently flip cell assignments between trained and
    assigned paths)."""
    return F.round(
        F.aggregate(
            F.zip_with(
                a, b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


# one definition of the session fan-out contract (advice r16: this was
# a verbatim copy of dedup._shuffle_partitions under a misleading name)
from .dedup import _shuffle_partitions as _default_parallelism  # noqa: E402


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("__norm", _norm(F.col(vec_col)))


def _cosine_sim(qe, qnorm, vec, norm):
    """6-dp cosine similarity, NULL for a zero-norm side: an all-zero
    embedding has no direction — under ANSI mode the unguarded division
    aborted the whole query with DIVIDE_BY_ZERO, and with ANSI off the
    NaN ranked ABOVE every real similarity (review round 12). Callers
    filter the NULLs before ranking (a zero vector is never a
    neighbor)."""
    prod = qnorm * norm
    return F.when(prod > 0, F.round(_dot(qe, vec) / prod, 6)).cast("double")


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    Two round-16 optimization-pass changes (results identical):

    - The corpus side is repartitioned to the session's shuffle
      parallelism before the broadcast join: a single-file input scans
      as ONE partition and the whole O(|corpus| x |queries| x dim)
      cosine fold then runs serialized on one core (the same
      single-file trap minhash_signature_mapside documents; the
      profiled bench stage was a 1-task job). The id+vector shuffle is
      trivial next to the fold, and at real scale a multi-file corpus
      makes the repartition a cheap rebalance.
    - The NULL-sim filter (zero-norm vectors have no direction) runs
      AFTER the top-k window, as ``sim IS NOT NULL AND rn <= k``,
      instead of directly on the join output. The optimizer pushed the
      pre-window filter into the broadcast-join condition, where the
      full dot-product fold was evaluated ONCE for the condition and
      AGAIN for the projected ``sim`` — doubling the per-pair compute
      (guide §4.4's duplicated-expression class, visible as the fold
      appearing twice in plans/r16/similarity_topk_cosine_before.txt).
      Equivalence: ``sim DESC NULLS LAST`` ranks every NULL below every
      real similarity and the rounded sim rides unchanged, so non-NULL
      rows receive identical row_numbers either way and the post-window
      NULL filter discards exactly the rows the pre-window filter did
      (a query with < k real neighbors returns the same short list).
    """
    n_part = _default_parallelism(emb.sparkSession)
    base = with_norm(emb.repartition(n_part), vec_col)
    q = with_norm(
        emb.filter(F.col(id_col).isin(query_ids)), vec_col
    ).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("__qe"),
        F.col("__norm").alias("__qnorm"),
    )
    sims = base.join(F.broadcast(q), F.col(id_col) != F.col("qid")).withColumn(
        "sim",
        _cosine_sim(
            F.col("__qe"), F.col("__qnorm"), F.col(vec_col), F.col("__norm")
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= k) & F.col("sim").isNotNull())
        .select("qid", F.col(id_col).alias("vec_id_n"), "sim", F.col("rn").cast("bigint").alias("rn"))
        .orderBy("qid", "rn")
    )


def kmeans_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means — the IVF coarse-quantizer trainer
    (feed the result to ``ivf_topk(centroids=...)``).

    Init = the ``k`` lowest-id vectors (same deterministic seed as
    ``ivf_topk``'s stand-in). Each iteration: (1) ASSIGN — the broadcast
    1-row centroid relation attaches map-side and every vector takes the
    argmin of its 6-dp-rounded squared L2 distances (first-min
    tie-break, matching both numpy argmin and Spark array_position);
    (2) UPDATE — per-(cell, dim) mean via posexplode + hash aggregate
    (one shuffle of rows x dims; partial aggregation applies), then a
    k x dim driver collect (metadata-scale). Components round to 6 dp
    per iteration so FP summation order cannot drift runs apart. Empty
    cells keep their previous centroid.

    Scale note: the update shuffle is rows x dims — at corpus scale you
    train on a SAMPLE (the standard IVF practice; the quantizer needs
    only a representative subset), then assign the full corpus once,
    map-side, exactly as ivf_topk does.
    """
    spark = emb.sparkSession
    init_rows = (
        emb.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    cents = [[round(float(v), 6) for v in r[vec_col]] for r in init_rows]
    if len(cents) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(cents)}")
    dim = len(cents[0])
    # ONE materialization of the (already sampled) training projection:
    # each Lloyd iteration otherwise re-scanned and re-derived the whole
    # input lineage (review round 12)
    emb = emb.select(vec_col).persist()
    try:
        return _kmeans_iterate(spark, emb, vec_col, cents, dim, iters)
    finally:
        emb.unpersist()


def _kmeans_iterate(spark, emb, vec_col, cents, dim, iters):
    for _ in range(iters):
        cent_df = spark.createDataFrame([(cents,)], "__cents array<array<double>>")

        def d2(c):
            return _l2sq_rounded(c, F.col(vec_col))

        assigned = (
            emb.crossJoin(F.broadcast(cent_df))
            .withColumn("__dists", F.transform(F.col("__cents"), d2))
            .withColumn(
                "__cell",
                F.array_position(F.col("__dists"), F.array_min("__dists")).cast("int"),
            )
            .select("__cell", F.posexplode(F.col(vec_col)).alias("__pos", "__val"))
        )
        means = (
            assigned.groupBy("__cell", "__pos")
            .agg(F.avg(F.col("__val").cast("double")).alias("__m"))
            .collect()  # k x dim rows: metadata-scale
        )
        new = [list(c) for c in cents]  # empty cells keep previous value
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            if r["__cell"] is None:
                # a NULL element inside an embedding nulls every
                # distance -> argmin NULL: name the data problem instead
                # of a driver-side TypeError mid-training
                raise ValueError(
                    "kmeans_fit: some rows produced no cell assignment "
                    f"(embedding with NULL elements or dim != {dim}) — "
                    "clean or filter the input vectors first"
                )
            by_cell.setdefault(r["__cell"] - 1, {})[r["__pos"]] = r["__m"]
        for ci, comp in by_cell.items():
            new[ci] = [round(float(comp[p]), 6) for p in range(dim)]
        if new == cents:
            break
        cents = new
    return cents





def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer assigns every
    vector to its nearest centroid cell (argmin L2), queries probe the
    ``nprobe`` nearest cells, and exact cosine ranks only the candidates
    in probed cells.

    Centroids default to the ``n_centroids`` lowest-id vectors (the
    same deterministic seed kmeans_fit initializes from, id-contiguity
    NOT assumed); pass
    ``centroids=kmeans_fit(emb)`` for a trained quantizer (everything
    downstream is unchanged).
    The centroid table is metadata-scale; it is shipped to executors as
    a BROADCAST one-row DataFrame holding an array<array<double>>
    column — DATA, not an inlined literal expression (an earlier
    version built ``F.array(F.lit(...)*k*dim)``, whose expression tree
    breaks codegen at real centroid counts; a broadcast relation is
    O(1) in the plan no matter how many centroids). CELL ASSIGNMENT IS
    STILL PURE MAP-SIDE: the broadcast nested-loop join with a single
    row adds the centroid array to every partition without shuffling
    the corpus, and the argmin folds over it per row. Candidate
    matching is an equi-join on cell id (shuffle by cell, queries
    broadcast), never all-pairs. (Per-row assignment cost is
    O(n_centroids * dim) inside JVM higher-order functions; for
    thousands of centroids x hundreds of dims, the same broadcast
    array would feed an Arrow-batched pandas UDF doing one matmul per
    batch — the plan shape is identical.)

    Determinism: distances and similarities round to 6 dp before any
    argmin/rank, ties break on cell/vec id — so FP summation-order noise
    cannot flip cells or ranks across engines."""
    if centroids is not None:
        cent_data = [[float(v) for v in c] for c in centroids]
        n_centroids = len(cent_data)
    else:
        # the n_centroids LOWEST-ID vectors (same deterministic stand-in
        # as kmeans_fit's init): orderBy+limit, not id < n — ids are not
        # guaranteed contiguous from 0, and a short/empty centroid set
        # used to silently return wrong or empty results (NULL argmin
        # cells, phantom probed cells) instead of erroring
        cent_rows = (
            emb.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
        )
        cent_data = [[float(v) for v in r[vec_col]] for r in cent_rows]
        if len(cent_data) < n_centroids:
            raise ValueError(
                f"ivf_topk: need at least n_centroids={n_centroids} "
                f"vectors for the default quantizer, got {len(cent_data)}"
            )
    cent_df = emb.sparkSession.createDataFrame(
        [(cent_data,)], "__cents array<array<double>>"
    )
    cents = F.col("__cents")

    base = (
        with_norm(emb, vec_col)
        .crossJoin(F.broadcast(cent_df))  # 1-row broadcast: map-side attach
        # the ONE shared distance contract (_l2sq_rounded): an inline
        # copy here could silently desynchronize trained vs assigned
        # cells if the rounding ever changed (review round 12)
        .withColumn(
            "__dists",
            F.transform(cents, lambda c: _l2sq_rounded(c, F.col(vec_col))),
        )
        .drop("__cents")
        .withColumn(
            "__cell",
            F.array_position(F.col("__dists"), F.array_min("__dists")).cast("int"),
        )
        # a NULL element (or dim mismatch vs the centroids) nulls every
        # distance -> NULL cell: such a row can never match the probe
        # equi-join anyway; drop it EXPLICITLY so the contract is
        # documented rather than an accident of join null-semantics
        .filter(F.col("__cell").isNotNull())
    )
    probe_cells = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_centroids)),
                    lambda i: F.struct(
                        F.element_at("__dists", i).alias("d"), i.alias("c")
                    ),
                )
            ),
            1,
            nprobe,
        ),
        lambda s: s["c"],
    )
    q = (
        base.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("__qe"),
            F.col("__norm").alias("__qnorm"),
            F.explode(probe_cells).alias("__cell"),
        )
    )
    # both sides carry a __cell column -> alias-qualified equi-join
    sims = base.alias("b").join(
        F.broadcast(q.alias("p")),
        (F.col("b.__cell") == F.col("p.__cell"))
        & (F.col(f"b.{id_col}") != F.col("p.qid")),
    ).withColumn(
        "sim",
        _cosine_sim(
            F.col("p.__qe"), F.col("p.__qnorm"),
            F.col(f"b.{vec_col}"), F.col("b.__norm"),
        ),
    )
    # NULL-sim filter AFTER the top-k window (the cosine_topk move,
    # round-16 optimization pass): a pre-window filter is pushed into
    # the join condition and the optimizer then evaluates the full
    # dot-product fold twice per pair. sim DESC NULLS LAST ranks every
    # NULL below every real similarity, so non-NULL rows get identical
    # row numbers and the post-window filter discards exactly the same
    # rows.
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(f"b.{id_col}").asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= k) & F.col("sim").isNotNull())
        .select(
            "qid",
            F.col(f"b.{id_col}").alias("vec_id_n"),
            "sim",
            F.col("rn").cast("bigint").alias("rn"),
            F.col("b.__cell").cast("bigint").alias("cell"),
        )
        .orderBy("qid", "rn")
    )


def sign_bucket(vec_col, n_bits: int = 8):
    """LSH bucket: sign bits of the first n_bits components."""
    bits = [
        F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def lsh_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket, joined by bucket equality (shuffle-by-bucket, no broadcast of
    the corpus needed at scale)."""
    base = with_norm(emb, vec_col).withColumn("__bucket", sign_bucket(vec_col, n_bits))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("__qe"),
        F.col("__norm").alias("__qnorm"),
        F.col("__bucket").alias("__qbucket"),
    )
    sims = (
        base.join(
            F.broadcast(q),
            (F.col("__bucket") == F.col("__qbucket")) & (F.col(id_col) != F.col("qid")),
        )
        .withColumn(
            "sim",
            _cosine_sim(
                F.col("__qe"), F.col("__qnorm"), F.col(vec_col), F.col("__norm")
            ),
        )
    )
    # post-window NULL-sim filter: same double-evaluation fix and same
    # NULLS-LAST equivalence argument as cosine_topk/ivf_topk (r16)
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= k) & F.col("sim").isNotNull())
        .select(
            "qid",
            F.col(id_col).alias("vec_id_n"),
            "sim",
            F.col("rn").cast("bigint").alias("rn"),
            F.col("__bucket").alias("bucket"),
        )
        .orderBy("qid", "rn")
    )


def pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (asymmetric distance computation) — the
    billion-scale technique: each vector is compressed to ``m`` one-byte
    codes (argmin sub-codebook entry per subspace), queries score the
    compressed corpus through a per-query lookup table instead of
    touching raw vectors.

    Layout and cost at scale:
    - the codebook ([m][n_codes][dim/m], here the deterministic
      lowest-id stand-in — swap in per-subspace ``kmeans_fit`` output
      for trained codes) is metadata-scale and rides a 1-row BROADCAST
      relation, so ENCODING IS PURE MAP-SIDE: one pass over the corpus
      emits m small ints per vector (a 32x compression of a 64-dim
      float vector), and at 100 TB the codes table is the only thing
      the query path ever scans;
    - the per-query LUT (m x n_codes distances) is computed once per
      query (also map-side against the broadcast codebook), broadcast
      with the query set, and ADC is a zip_with fold over m array
      lookups per corpus row — no raw-vector I/O, no shuffle of the
      corpus, candidates never materialize pairwise distances in
      Python.

    Determinism: sub-distances round to 6 dp before the argmin
    (first-min tie-break = array_position = the oracle's
    ROW_NUMBER ORDER BY d2, j), and ADC rounds to 6 dp over
    already-6-dp-rounded terms, so summation-order noise (~1e-15)
    cannot cross a rounding boundary (~5e-7 away at closest).
    """
    spark = emb.sparkSession
    # orderBy+limit, not id < n: ids are not guaranteed contiguous from
    # 0 (the same fix ivf_topk's quantizer got; review round 12). NOTE
    # the shipped spec's DuckDB oracle still indexes codes by vec_id+1,
    # which only agrees on contiguous-id fixtures — the engine is the
    # general one.
    cb_rows = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_codes)
        .collect()  # metadata-scale: n_codes vectors
    )
    if len(cb_rows) < n_codes:
        raise ValueError(f"need {n_codes} codebook vectors, got {len(cb_rows)}")
    dim = len(cb_rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    vecs = [[float(v) for v in r[vec_col]] for r in cb_rows]
    cb = [[vecs[j][s * sub:(s + 1) * sub] for j in range(n_codes)] for s in range(m)]
    cb_df = spark.createDataFrame([(cb,)], "__cb array<array<array<double>>>")

    def _subvec(s):  # s is a 0-based int Column
        return F.slice(F.col(vec_col), s * F.lit(sub) + F.lit(1), F.lit(sub))

    def _dists_for(s):  # distances of this row's subvector s to all codes
        return F.transform(
            F.element_at(F.col("__cb"), (s + F.lit(1)).cast("int")),
            # the ONE shared distance contract (_l2sq_rounded) — an
            # inline copy risked desynchronizing encode vs training
            lambda cbj: _l2sq_rounded(cbj, _subvec(s)),
        )

    subspaces = F.sequence(F.lit(0), F.lit(m - 1))
    # materialize ALL sub-distances ONCE per row: Spark does no common-
    # subexpression elimination inside lambda trees, so deriving codes
    # from two _dists_for calls doubled the m x n_codes x sub distance
    # arithmetic of the full-corpus encode pass (review round 12); the
    # LUT is the SAME array, reused for free on the query side
    dall = F.transform(subspaces, _dists_for)
    codes = F.transform(
        F.col("__dall"), lambda d: F.array_position(d, F.array_min(d))
    )
    enc = (
        emb.crossJoin(F.broadcast(cb_df))
        .withColumn("__dall", dall)
        .withColumn("__codes", codes)
    )
    q = (
        enc.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("qid"), F.col("__dall").alias("__lut"))
    )
    enc = enc.drop("__cb", "__dall")
    adc = F.round(
        F.aggregate(
            F.zip_with(
                F.col("p.__lut"),
                F.col("b.__codes"),
                lambda lut_s, c: F.element_at(lut_s, c.cast("int")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    pairs = (
        enc.alias("b")
        .join(F.broadcast(q.alias("p")), F.col(f"b.{id_col}") != F.col("p.qid"))
        .withColumn("adc", adc.cast("double"))
        # a NULL-element vector yields NULL codes -> NULL adc, and asc's
        # NULLS FIRST would crown the corrupt row nearest neighbor of
        # every query (review round 12) — drop it, it has no distance
        .filter(F.col("adc").isNotNull())
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col(f"b.{id_col}").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            F.col(f"b.{id_col}").alias("vec_id_n"),
            "adc",
            F.col("rn").cast("bigint").alias("rn"),
        )
        .orderBy("qid", "rn")
    )


def mine_triplets(
    emb: DataFrame,
    anchor_ids: list[int],
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-triplet mining for contrastive embedding training: for each
    anchor, the HARDEST POSITIVE (most-similar same-label vector) and
    HARDEST NEGATIVE (most-similar different-label vector), plus the
    triplet margin — the batch-mining step of triplet/InfoNCE data
    pipelines.

    Scale shape: the anchor set is metadata-scale and broadcast (the
    per-anchor full scan is exact by construction; the corpus-wide
    variant swaps this stage for the ANN bucket join, same downstream).
    ONE conditional max_by aggregate keyed by anchor classifies both
    ranks (round 17; previously a row_number window over (anchor,
    is-positive) + a second anchor-keyed aggregate): the argmax of
    ``struct(sim, -id)`` among a flag's rows IS the window's
    ``ORDER BY sim DESC, id ASC`` rn=1 winner (NULL ordering structs —
    the other flag's rows, NULL-label rows — are ignored by max_by,
    exactly the rows the old CASE aggregates nulled out), and the
    aggregate collapses map-side, so the anchors×corpus sims relation
    crosses ONE exchange un-sorted instead of an exchange + sort +
    window + a second exchange. Interleaved noop A/B at sf0.1:
    0.611 -> 0.519 s mean (−15%), rows identical. Similarity rounded
    to 6 dp before ranking so FP noise cannot reorder across engines."""
    base = with_norm(emb, vec_col)
    anchors = base.filter(F.col(id_col).isin(anchor_ids)).select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("__albl"),
        F.col(vec_col).alias("__ae"),
        F.col("__norm").alias("__anorm"),
    )
    sims = (
        base.join(F.broadcast(anchors), F.col(id_col) != F.col("anchor_id"))
        .withColumn(
            "sim",
            _cosine_sim(
                F.col("__ae"), F.col("__anorm"), F.col(vec_col), F.col("__norm")
            ),
        )
        .filter(F.col("sim").isNotNull())
        # NULL-label candidates land in an is_pos=NULL partition and are
        # excluded from BOTH ranks by design (unlabeled rows are neither
        # positives nor negatives); an anchor whose own label is NULL
        # yields an all-NULL output row — the oracle mirrors both
        .withColumn("is_pos", (F.col(label_col) == F.col("__albl")).cast("int"))
    )
    def _hardest(flag: int):
        # argmax of (sim, -id) among this flag's rows = the old window's
        # ORDER BY sim DESC, id ASC rn=1 winner; rows whose flag differs
        # (or whose label is NULL -> is_pos NULL) get a NULL ordering
        # struct and are ignored by max_by
        order = F.when(
            F.col("is_pos") == flag,
            F.struct(F.col("sim"), (-F.col(id_col)).alias("__negid")),
        )
        return (
            F.max_by(F.col(id_col), order).cast("bigint"),
            F.max(F.when(F.col("is_pos") == flag, F.col("sim"))).cast("double"),
        )

    pos_id, pos_sim = _hardest(1)
    neg_id, neg_sim = _hardest(0)
    return (
        sims.groupBy("anchor_id")
        .agg(
            pos_id.alias("pos_id"),
            pos_sim.alias("pos_sim"),
            neg_id.alias("neg_id"),
            neg_sim.alias("neg_sim"),
        )
        .withColumn(
            "margin",
            F.round(F.col("pos_sim") - F.col("neg_sim"), 6).cast("double"),
        )
        .orderBy("anchor_id")
    )
