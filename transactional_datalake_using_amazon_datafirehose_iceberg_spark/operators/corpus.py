"""Corpus-assembly operators: the last mile between a curated document
set and a training run — sequence packing, domain mixture sampling, and
exact-substring duplicate spans.

All three are pure-DataFrame programs (single whole-stage-codegen map
stages plus the minimum shuffles their semantics require); none collect
more than metadata-scale state to the driver.

Reference scope note: the reference pipeline ends at queryable Iceberg
tables (README.md:292-309); these operators cover the downstream
training-data preparation a consumer of those tables runs, per the
engine's LLM-pipeline charter (SURVEY.md §2 north-star tier).

Tokenization contract: SINGLE-SPACE splits, repo-wide (this module,
text.py token budgeting, the fingerprints/tfidf oracles) — the fixtures
are single-space-normalized and every oracle mirrors the same split.
Corpora with tab/newline/multi-space runs must be whitespace-normalized
upstream, or phantom empty tokens inflate counts and glue
newline-separated words (the same class simhash16 fixed for its own
bucketing, where normalization could change quietly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_chunks(
    docs: DataFrame,
    budget: int = 64,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining): within
    each shard, documents are laid end-to-end in ``id_col`` order and the
    token stream is cut into fixed ``budget``-token training examples.
    Each document reports the pack (example) its first token lands in,
    the pack its last token lands in, and how many examples it spans —
    the bookkeeping a packed-dataset writer needs to emit boundaries and
    attention-mask resets.

    Scale shape: ONE shuffle — the window partitioned by the shard
    column. Shards (source files / domains) are the parallelism unit,
    exactly how distributed packing runs at 100 TB: the stream order
    inside a shard is a semantic requirement, order across shards is
    not. No driver-side state; the cumulative sum is a standard
    partitioned running total (no global ordering, no single-partition
    window).
    """
    if budget < 1:
        # fail at the API, not as an opaque ANSI DIVIDE_BY_ZERO inside
        # the executed plan (review round 13)
        raise ValueError(f"budget must be >= 1, got {budget}")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL text = zero tokens, explicitly: an un-guarded size(split())
    # returned NULL, the window SUM silently skipped the row, and the
    # doc emitted NULL pack bounds a packed-dataset writer trips over
    toks = F.when(
        F.col(text_col).isNull(), F.lit(0)
    ).otherwise(F.size(F.split(F.col(text_col), " ")))
    return (
        docs.select(
            F.col(id_col),
            F.col(shard_col),
            toks.cast("bigint").alias("n_tokens"),
        )
        .withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            id_col,
            shard_col,
            "n_tokens",
            "cum_before",
            F.floor(F.col("cum_before") / budget).cast("bigint").alias("pack_first"),
            # zero-token doc: the last-token formula gave cum_before - 1
            # (-1 at stream start; inverted bounds at pack boundaries —
            # review round 11). Its "position" is where its first token
            # WOULD land: pack_last = pack_first, spans = 0 below.
            F.when(
                F.col("n_tokens") > 0,
                F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / budget),
            )
            .otherwise(F.floor(F.col("cum_before") / budget))
            .cast("bigint")
            .alias("pack_last"),
        )
        .withColumn(
            "n_packs_spanned",
            F.when(
                F.col("n_tokens") > 0,
                F.col("pack_last") - F.col("pack_first") + 1,
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
    )


def duplicated_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for every document,
    the merged token spans covered by a word-``n``-gram that occurs more
    than once in the corpus (counting intra-document repeats, as the
    suffix-array formulation does). Downstream, these spans are cut out
    of the training text rather than dropping whole documents.

    Output per document: number of merged duplicate spans, duplicated
    token count, total token count, and an integer-arithmetic
    ``dup_frac_pct`` (exact on both engines).

    Scale shape: the distributed n-gram variant of the suffix-array
    algorithm (the standard Spark formulation). Two corpus-volume
    shuffles, both linear and partial-aggregation friendly: (1) the gram
    occurrence count, (2) the join of duplicated grams back onto their
    positions. Both shuffles carry the RAW gram strings — exactness over
    shuffle width (the oracle compares gram-for-gram); at 100 TB, keying
    on md5(gram) instead trades a collision epsilon for ~3x narrower
    shuffles, a one-line change at both count and join. Span merging is a gaps-and-islands window partitioned by
    document — never wider than one document's matches. The duplicated
    gram set stays distributed (no driver collect, no broadcast of
    corpus-volume state).
    """
    if n < 1:
        # n = 0 would emit a descending sequence() of phantom positions
        # instead of erroring (review round 13)
        raise ValueError(f"n must be >= 1, got {n}")
    toked = docs.select(
        F.col(id_col),
        # NULL text = zero tokens (defined output row: 0 spans, 0 dup
        # tokens, 0 n_tokens, 0 pct — not NULLs a downstream filter
        # silently drops)
        F.when(F.col(text_col).isNull(), F.array().cast("array<string>"))
        .otherwise(F.split(F.lower(F.col(text_col)), " "))
        .alias("__toks"),
    )
    # (doc, pos, gram) with pos 0-based; docs shorter than n emit none
    grams = toked.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"CASE WHEN size(__toks) < {n} THEN array() "
                f"ELSE transform(sequence(1, size(__toks) - {n - 1}),"
                f" i -> array_join(slice(__toks, i, {n}), ' ')) END"
            )
        ).alias("pos", "gram"),
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("__occ"))
        .filter(F.col("__occ") > 1)
        .select("gram")
    )
    hits = grams.join(dup, "gram").select(
        id_col, F.col("pos").alias("s"), (F.col("pos") + n - 1).alias("e")
    )
    # gaps-and-islands: a hit starts a new island when it begins past the
    # running max end of all earlier hits in the doc
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        hits.withColumn("__pmax", F.max("e").over(w_prev))
        .withColumn(
            "__new",
            (F.col("__pmax").isNull() | (F.col("s") > F.col("__pmax") + 1)).cast(
                "int"
            ),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(
                Window.partitionBy(id_col)
                .orderBy("s")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(id_col, "__isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    per_doc = islands.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_tokens"),
    )
    totals = toked.select(
        F.col(id_col), F.size("__toks").cast("bigint").alias("n_tokens")
    )
    return (
        totals.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("int").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac_pct",
            # greatest(n, 1): a zero-token (NULL-text) doc is 0% dup,
            # not an ANSI DIVIDE_BY_ZERO that kills the job
            F.floor(
                F.col("dup_tokens") * 100 / F.greatest(F.col("n_tokens"), F.lit(1))
            ).cast("int"),
        )
    )


def temperature_mixture_sample(
    docs: DataFrame,
    target_frac_pct: int = 40,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based domain mixture sampling at T=2 (the standard
    rebalancing step before pretraining: small domains are upsampled
    relative to their share, large domains downsampled — mixture weight
    p_d proportional to sqrt(n_d), as in multilingual/Pile-style
    training mixes). Selects a deterministic subset of ~target_frac_pct
    percent of the corpus and reports per-domain kept/total counts.

    Determinism: each domain keeps its ``ceil(quota_d)`` smallest
    documents by (md5(doc_id), doc_id) — a stable pseudo-random order
    reproducible on any engine, insensitive to partitioning and insert
    order. T is fixed at 2 because sqrt is correctly rounded in IEEE 754
    (pow is not), so the quota arithmetic is bit-identical across
    engines.

    Scale shape: the domain weight table is one metadata-scale aggregate
    (rows = distinct domains) joined back broadcast; selection is a rank
    window partitioned by domain. Two shuffles total (domain agg +
    domain-partitioned rank), both on the domain key; no driver-side
    math on corpus-volume data.
    """
    counts = docs.groupBy(domain_col).agg(F.count("*").alias("__nd"))
    # the corpus totals ride as unpartitioned window aggregates OVER THE
    # COUNTS TABLE (rows = distinct domains, metadata scale) — no
    # cross join with a 1-row aggregate, which would plan as a
    # BroadcastNestedLoopJoin and trip the scale sweep for no benefit
    w_all = Window.partitionBy()
    quota = counts.select(
        domain_col,
        "__nd",
        # quota_d = target * total * (sqrt(n_d)/S) with target = pct/100.
        # round to 9 dp BEFORE ceil: when every domain has the same
        # size the ratio is EXACTLY integral and 1-ulp noise from the
        # S-summation order (which varies with partitioning) would
        # otherwise flip ceil between n and n+1 across engines/runs;
        # genuinely fractional quotas sit far beyond 1e-9 from integers
        F.ceil(
            F.round(
                F.lit(target_frac_pct)
                * F.sum("__nd").over(w_all)
                * F.sqrt(F.col("__nd"))
                / (F.sum(F.sqrt(F.col("__nd"))).over(w_all) * 100),
                9,
            )
        ).alias("__keep"),
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = docs.select(F.col(id_col), F.col(domain_col)).withColumn(
        "__rk", F.row_number().over(w)
    )
    return (
        # null-safe: a NULL-domain group is a real group (it contributed
        # to the totals and holds its own quota) — a plain equi-join
        # dropped its documents entirely while still consuming mixture
        # quota, deflating the global kept fraction (review round 10)
        # broadcast scale-class: quota is domain-cardinality — one row
        # per mixture domain (coarse buckets by contract, not raw hosts)
        ranked.join(
            F.broadcast(quota),
            on=[ranked[domain_col].eqNullSafe(quota[domain_col])],
        )
        .drop(quota[domain_col])
        .withColumn("kept", (F.col("__rk") <= F.col("__keep")).cast("int"))
        .groupBy(domain_col)
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum("kept").cast("bigint").alias("n_kept"),
        )
        .withColumn(
            "kept_pct",
            F.floor(F.col("n_kept") * 100 / F.col("n_total")).cast("int"),
        )
    )
