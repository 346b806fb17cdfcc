"""Text analysis operators (NORTH-STAR tier): quality stats, language ID,
token counting, document fingerprinting.

Everything is built from portable string arithmetic (length/replace
counting, md5) so each operator has an exact DuckDB oracle. All
expressions are JVM-side whole-stage-codegen — this whole family is a
single map stage at any scale (no shuffle except final aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .materialize import materialize


def _count_word(col, word: str):
    """Exact whitespace-token occurrence count. The earlier
    replace-based length arithmetic undercounted ADJACENT occurrences
    ('the the' counted once: the shared delimiter space is consumed by
    the first non-overlapping match) — and the skew propagated into
    every lang-id score (review round 10)."""
    return F.size(
        F.filter(F.split(F.lower(col), " "), lambda x: x == F.lit(word))
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Char/token counts, average token length, punctuation count,
    stopword ratio, and a simple quality gate."""
    t = F.col(text_col)
    n_tokens = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    return df.select(
        F.col(id_col),
        # lang rides through when the frame carries it (the documents
        # fixture does); frames without it keep the parameterized API
        *([F.col("lang")] if "lang" in df.columns else []),
        F.length(t).cast("bigint").alias("n_chars_q"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(
            F.length(F.replace(t, F.lit(" "), F.lit(""))) * 1.0 / n_tokens, 4
        ).cast("double").alias("avg_tok_len"),
        _count_word(t, "the").cast("bigint").alias("n_the"),
        F.when((F.length(t) >= 50) & (n_tokens >= 10), 1).otherwise(0).alias("quality_ok"),
    )


# language -> marker words for the n-gram/stopword scoring heuristic
_LANG_MARKERS = {
    "en": ("the", "and"),
    "es": ("el", "la"),
    "de": ("der", "und"),
    "fr": ("le", "et"),
}


def lang_id_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word scoring language ID. Deterministic argmax with a
    fixed preference order on ties (en > es > de > fr)."""
    scored = df.select(
        F.col(id_col),
        # actual_lang only when the frame carries it (the fixture
        # documents table does); the API is otherwise fully
        # parameterized and a hardcoded column crashed any other frame
        # (review round 12)
        *(
            [F.col("lang").alias("actual_lang")]
            if "lang" in df.columns
            else []
        ),
        *[
            sum(_count_word(F.col(text_col), m) for m in markers)
            .cast("bigint")
            .alias(f"c_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    pred = (
        # NULL text -> NULL prediction: with NULL counts every WHEN
        # condition is NULL and the otherwise() used to confidently
        # predict 'fr' for a document with no text (review round 10)
        F.when(F.col("c_en").isNull(), F.lit(None).cast("string"))
        .when(
            (F.col("c_en") >= F.col("c_es"))
            & (F.col("c_en") >= F.col("c_de"))
            & (F.col("c_en") >= F.col("c_fr")),
            F.lit("en"),
        )
        .when((F.col("c_es") >= F.col("c_de")) & (F.col("c_es") >= F.col("c_fr")), F.lit("es"))
        .when(F.col("c_de") >= F.col("c_fr"), F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return scored.withColumn("predicted_lang", pred)


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting three ways (LLM-pipeline budgeting): whitespace
    tokens, word/punctuation tokens, and a BPE-ish piece count (greedy
    <=4-char alpha chunks + single digits + punctuation — a portable
    approximation of subword tokenizer piece counts for cost
    estimation). All regex counting, one map stage. Whitespace is an
    EXPLICIT class, never \\s: Java's \\s includes vertical tab
    (\\x0B), RE2's does not, so the shorthand silently diverged the
    engines on \\x0B input (review round 12) — [ \\t\\n\\r\\f]
    means the same thing on both."""
    t = F.col(text_col)
    _ws = " \\t\\n\\r\\f"
    word_re = f"[A-Za-z0-9]+|[^A-Za-z0-9{_ws}]"
    bpe_re = f"[A-Za-z]{{1,4}}|[0-9]|[^A-Za-z0-9{_ws}]"
    return df.select(
        F.col(id_col),
        F.size(F.split(t, " ")).cast("bigint").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(word_re))
        .cast("bigint")
        .alias("n_word_tokens"),
        F.regexp_count(t, F.lit(bpe_re))
        .cast("bigint")
        .alias("n_bpe_pieces"),
        F.round(
            F.length(t)
            * 1.0
            / F.greatest(
                F.regexp_count(t, F.lit(bpe_re)),
                F.lit(1),
            ),
            4,
        ).cast("double").alias("chars_per_piece"),
    )


def rolling_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    base: int = 31,
    mod: int = 1_000_003,
    window: int = 8,
) -> DataFrame:
    """Rolling polynomial-hash fingerprints, all JVM-side higher-order
    expressions (no UDF):

    - ``fp_poly``: the full-document polynomial hash
      (fold of ``acc*base + code mod p`` over char codes);
    - ``fp_winnow_min``: the MINIMUM hash over all ``window``-char
      substrings — the winnowing/MinHash-style selector that is stable
      under appends and local edits outside the chosen window.

    Char codes come from ``ascii(substring(text, i, 1))`` so the DuckDB
    oracle (``ord``/``list_reduce``) folds char-for-char identically;
    mod keeps every intermediate < 2^35, exact in int64 on both engines.
    """
    t = f"`{text_col}`"  # backtick: names with spaces/keywords must parse
    # Code-point array computed ONCE per row (round-16 optimization
    # pass): the old per-index `ascii(substring(t, i, 1))` navigated the
    # string's UTF-8 bytes from the start on EVERY call — O(len^2)
    # character work per doc for the poly fold, worse for the windowed
    # min. `split(t, '')` yields the identical per-character array
    # (verified incl. multibyte; the one divergence is the empty string,
    # which the existing length=0 guard already short-circuits — that
    # guard exists because sequence(1, 0) DESCENDS in Spark and an empty
    # doc used to fold over a spurious [1, 0] index list).
    cs = f"transform(split({t}, ''), c -> ascii(c))"
    # explicit empty-text guard, as before (oracle guards with CASE n=0)
    poly = (
        f"CASE WHEN length({t}) = 0 THEN 0L ELSE "
        f"aggregate(__cs, 0L, (acc, c) -> (acc * {base} + c) % {mod}) END"
    )
    # slice(__cs, i, w) truncates at the array end — identical to the
    # old sequence(i, least(i + w - 1, length)) window bound
    win = (
        f"CASE WHEN length({t}) = 0 THEN 0L ELSE "
        f"array_min(transform(sequence(1, greatest(size(__cs) - {window - 1}, 1)), "
        f"i -> aggregate(slice(__cs, i, {window}), "
        f"0L, (acc, c) -> (acc * {base} + c) % {mod}))) END"
    )
    return df.select(
        F.col(id_col), F.col(text_col), F.expr(cs).alias("__cs")
    ).select(
        F.col(id_col),
        F.expr(poly).cast("bigint").alias("fp_poly"),
        F.expr(win).cast("bigint").alias("fp_winnow_min"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Two document fingerprints: exact (md5 of lowered text) and
    bag-of-words (md5 of the sorted token multiset) — the latter is
    order-invariant, catching shuffled near-dups."""
    lowered = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(lowered).alias("fp_exact"),
        # NULL text fingerprints NULL like fp_exact — concat_ws never
        # returns NULL, so an unguarded fp_bag was md5('') and silently
        # merged NULL-text docs with EMPTY-text docs in downstream
        # grouping (review round 11; absent content has no fingerprint)
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(
            F.md5(F.concat_ws(" ", F.sort_array(F.split(lowered, " "))))
        )
        .alias("fp_bag"),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality metrics (Rae et al. 2021 §A1.1):
    per-document distinct-token count, most-frequent-token count, and
    most-frequent-adjacent-bigram count, plus an integer-arithmetic keep
    flag (repetitious documents — boilerplate, keyword stuffing, decode
    loops — are the classic LLM-corpus pollutant these thresholds gate).

    Entirely map-side higher-order array expressions: the token array
    never leaves its row, so the operator is a single codegen'd map
    stage at any corpus size — no shuffle at all. Per-row cost is
    O(tokens x distinct) which is the right trade for web-scale docs
    (bounded length); corpora with pathological million-token rows
    should chunk first (text_chunk_windows).

    All outputs are integers (counts, not ratios): exact on both
    engines, no float-rounding drift. keep = distinct/total >= 0.3 AND
    top-bigram/total-bigrams <= 0.2, evaluated in integer
    cross-products; the bigram criterion only applies with >= 10
    bigrams of signal (on a 4-bigram doc even all-distinct text has a
    25% modal fraction — too little evidence to call repetition).
    """
    # count of the modal element of an array, map-side: for each distinct
    # value, count its occurrences; take the max (NULL-safe for len-0)
    def _mode_count(arr):
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda t: F.size(F.filter(arr, lambda x: x == t)),
            )
        )

    # hoist the token array into ONE projection (the grams() rationale):
    # building bigrams straight off split(lower(text)) re-tokenized the
    # document once per transform element — O(tokens x length) per row
    # (review round 10). The hoisted column tokenizes once.
    toks = F.col("__toks")
    with_toks = df.withColumn(
        "__toks", F.split(F.lower(F.col(text_col)), " ")
    )
    # guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]), so a
    # single-token doc must short-circuit to an empty array instead of
    # indexing out of bounds (ANSI mode errors, not NULLs)
    bigrams = F.expr(
        "CASE WHEN size(__toks) < 2 THEN array() "
        "ELSE transform(sequence(1, size(__toks) - 1),"
        " i -> concat(element_at(__toks, i), ' ',"
        "            element_at(__toks, i + 1))) END"
    )
    # NULL text = uniformly NULL metrics and keep = 0 (absent content
    # has no assessable quality — never "keep"). The unguarded version
    # mixed NULLs with coalesced zeros and a NULL keep (review round 11)
    null_text = F.col(text_col).isNull()
    out = with_toks.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("distinct_tokens"),
        F.when(null_text, F.lit(None))
        .otherwise(F.coalesce(_mode_count(toks), F.lit(0)))
        .cast("bigint").alias("top_token_n"),
        F.size(bigrams).cast("bigint").alias("n_bigrams"),
        F.when(null_text, F.lit(None))
        .otherwise(F.coalesce(_mode_count(bigrams), F.lit(0)))
        .cast("bigint").alias("top_bigram_n"),
    )
    return out.withColumn(
        "keep",
        F.when(F.col("n_tokens").isNull(), F.lit(False)).otherwise(
            (F.col("distinct_tokens") * 10 >= F.col("n_tokens") * 3)
            & (
                (F.col("n_bigrams") < 10)
                | (F.col("top_bigram_n") * 5 <= F.col("n_bigrams"))
            )
        ).cast("int"),
    )


def ngram_overlap_vs_benchmark(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / PaLM §C): for every
    corpus document OF AT LEAST ``n`` TOKENS, the number of its distinct
    word-n-grams that also occur anywhere in the benchmark set, plus its
    distinct n-gram total. Documents too short to form one n-gram carry
    no contamination signal and are EXCLUDED from the output (pinned by
    tests) — a downstream join must left-join and treat absent as
    not-contaminated. Downstream filters drop documents whose overlap
    exceeds a threshold before training, so eval numbers stay honest.

    Scale shape: the benchmark n-gram set is eval-suite sized (metadata
    scale next to a 100 TB corpus) — distinct-aggregated, then BROADCAST
    into a map-side semi-join against the corpus's exploded n-grams; the
    only shuffle is the per-doc count aggregation, keyed by doc id with
    map-side partial aggregation. Corpus bytes are never joined against
    corpus bytes."""

    def grams(df):
        # same sequence(1, 0)-descends guard as repetition_metrics: a doc
        # with fewer than n tokens has NO n-grams, not a slice-at-0 error.
        # Per-doc distinctness is computed MAP-SIDE with array_distinct on
        # the gram array before explode — equivalent to distinct() on the
        # exploded (doc_id, gram) rows since the distinct key includes the
        # doc id, but without shuffling corpus-gram volume (round-5 verdict:
        # the explode-then-distinct exchange was the op's dominant cost).
        # the token array is hoisted into its own projection so split()
        # runs once per row, not once per transform-lambda element
        toked = df.select(
            F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("__toks")
        )
        arr = F.expr(
            f"CASE WHEN size(__toks) < {n} THEN array() "
            f"ELSE array_distinct(transform(sequence(1, size(__toks) - {n - 1}),"
            f" i -> array_join(slice(__toks, i, {n}), ' '))) END"
        )
        return toked.select(F.col(id_col), F.explode(arr).alias("gram"))

    bench_grams = (
        grams(benchmark).select("gram").distinct().withColumn("__hit", F.lit(1))
    )
    # one broadcast LEFT join tags each corpus gram, one aggregation
    # produces both counts — total and overlap never meet in a second
    # doc_id-keyed shuffle join. Broadcast scale-class: eval-benchmark
    # grams — k ≪ corpus by construction (an eval set is thousands of
    # rows, not corpus-volume), the decontamination contract.
    return (
        grams(corpus)
        .join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_ngrams"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("bigint").alias("n_overlap"),
        )
        # contaminated = >= 5% of the doc's distinct n-grams hit the
        # benchmark (integer cross-product: exact on both engines)
        .withColumn(
            "contaminated",
            (F.col("n_overlap") * 20 >= F.col("n_ngrams")).cast("int"),
        )
    )


def rare_token_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 2,
) -> DataFrame:
    """Corpus-relative rarity signal (CCNet-style quality heuristic,
    integer-exact stand-in for LM perplexity): per document, the share of
    token occurrences whose CORPUS-WIDE count is <= ``rare_max_count``.
    Garbled or off-distribution text scores high; templated boilerplate
    scores near zero. Output is all integer arithmetic — exact on any
    engine.

    Scale shape: token occurrences shuffle twice, both linear and
    partial-aggregation friendly — (1) the corpus vocabulary count,
    (2) the per-document aggregate; the token->count join is
    co-partitioned with shuffle (1). The vocabulary stays distributed
    (never collected or broadcast — at 100 TB it is itself large).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("__c"))
    return (
        toks.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum((F.col("__c") <= rare_max_count).cast("int"))
            .cast("bigint")
            .alias("n_rare"),
        )
        .withColumn(
            "rare_pct",
            # integer `div`, not floor(double /): exact at any magnitude
            # (the bigram_fluency / compression_ratio fixed-point rule)
            F.expr("n_rare * 100 div n_tokens").cast("int"),
        )
    )


def bigram_fluency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Corpus-relative FLUENCY signal (the KenLM-perplexity-filter
    analogue of a training-data pipeline, in integer-exact arithmetic):
    per document, the fixed-point mean conditional bigram probability

        mean over positions of  floor(scale * c(prev,tok) / (c(prev)+V))

    where counts are corpus-wide and V is the CONTINUATION vocabulary
    size — the number of distinct token types observed as a bigram
    continuation (distinct ``tok`` over the pair-count table; the
    Kneser-Ney continuation-count flavor of the add-V mass).
    Predictable, templated text scores high; garbled or
    off-distribution text scores low — the inverse direction of
    perplexity, with the same ordering. All divisions are integer
    (floor of a BIGINT ratio), so the score is bit-identical on any
    engine — no transcendental log in sight.

    Scale shape: every stage is LINEAR in corpus size, and the corpus
    is TOKENIZED EXACTLY ONCE — ``bigrams`` is eagerly materialized
    (operators/materialize.py: localCheckpoint in the default mode,
    reliable checkpoint / disk persist under the fault-tolerance knob;
    the module's shared-subtree pattern, cf. connected_components)
    because three consumers read it (pair
    counts, the scoring join, and via pair_c the V scalar); without
    the checkpoint each consumer would re-run the tokenize + bigram
    explode over the full corpus. ``pair_c`` (already aggregated, vocabulary
    scale) is checkpointed too so its three consumers (prev_c, V, the
    scoring join) don't re-shuffle the corpus-scale bigram stream.
    V is ONE number — collected (metadata scale, like a centroid
    table) and inlined as a literal rather than cross-joined, so no
    1-row BroadcastNestedLoopJoin enters the plan. The vocabulary and
    bigram tables themselves stay distributed.
    """
    # adjacent-token pairing straight from the token array (round-16
    # optimization pass): the old posexplode + per-doc lag window
    # shuffled and sorted the full corpus-token relation just to pair
    # each token with its neighbor — a fact the row's own array already
    # holds. The transform is map-side (zero shuffle), result-identical
    # (verified row-for-row at sf0.1: 265,704 bigrams either way; a lag
    # NULL at position 0 and the i>=1 start drop the same row; docs
    # with < 2 tokens contribute no bigrams on both paths), and
    # measured 0.340 -> 0.268 s interleaved best-of-4.
    bigrams = (
        df.select(
            F.col(id_col),
            F.split(F.lower(F.col(text_col)), " ").alias("__w"),
        )
        .filter(F.size("__w") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__w) - 1),"
                    " i -> struct(__w[i-1] as prev, __w[i] as tok))"
                )
            ).alias("__b"),
        )
        .select(F.col(id_col), F.col("__b.prev"), F.col("__b.tok"))
    )
    bigrams = materialize(bigrams)
    pair_c = materialize(
        bigrams.groupBy("prev", "tok").agg(F.count("*").alias("__cp"))
    )
    prev_c = pair_c.groupBy("prev").agg(F.sum("__cp").alias("__cv"))
    v_n = pair_c.select(F.countDistinct("tok")).collect()[0][0]
    scored = (
        bigrams.join(pair_c, ["prev", "tok"])
        .join(prev_c, "prev")
        .withColumn(
            "__fp",
            F.expr(f"CAST(__cp * {scale} AS BIGINT) div (__cv + {int(v_n)})"),
        )
    )
    out = scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.expr("CAST(sum(__fp) div count(*) AS BIGINT)").alias("fluency_ppm"),
        F.min("__fp").cast("bigint").alias("min_ppm"),
    )
    # Both checkpoints are referenced by the returned plan (the scoring
    # join reads ``bigrams`` and ``pair_c``), so the operator cannot
    # self-release; in a long-lived session repeated calls accumulate
    # persisted blocks until driver GC (the leak class
    # connected_components fixed internally — here the blocks must
    # outlive the call). Contract: after FULLY consuming the result
    # (collect/write — the truncated lineage cannot be recomputed once
    # released), call ``release_checkpoints(result)``. The bench's
    # persistent-RDD diff sweep does this implicitly.
    out._sg_checkpoints = (bigrams, pair_c)
    # the attribute dies on ANY DataFrame transformation (.orderBy etc.
    # returns a fresh object) — review round 10: the registry fallback
    # lets release_checkpoints(None) free everything this module pinned
    # even when the caller only holds a derived frame
    _register_checkpoints(bigrams, pair_c)
    return out


# (session, checkpoint RDD id) pairs pinned by operators in this module
# and not yet released (see release_checkpoints). Ids, not DataFrames:
# the registry must not itself pin the Python objects (round-10
# advice: module-global strong references grew without bound in long
# sessions), and an id is all the RDD-layer unpersist needs.
_LIVE_CHECKPOINTS: list[tuple[SparkSession, int]] = []


def _checkpoint_rdd_id(df: DataFrame) -> int:
    """LogicalRDD id of an (eager) localCheckpoint result — the handle
    the RDD-layer unpersist needs (DataFrame.unpersist only clears
    cacheManager entries, never localCheckpoint blocks)."""
    return int(df._jdf.queryExecution().analyzed().rdd().id())


def _register_checkpoints(*cps: DataFrame) -> None:
    for c in cps:
        try:
            _LIVE_CHECKPOINTS.append((c.sparkSession, _checkpoint_rdd_id(c)))
        except Exception:
            pass  # registry is a fallback; the attachment still works


def release_checkpoints(df: DataFrame | None = None) -> None:
    """Release localCheckpoint blocks an operator pinned for its result.

    Operators that materialize shared subtrees (``bigram_fluency``)
    attach those checkpointed DataFrames to the result as
    ``_sg_checkpoints``; callers in long-lived sessions call this after
    fully consuming the result. The result must NOT be re-executed
    afterwards — a localCheckpoint truncates lineage, so its blocks
    cannot be recomputed. No-op for results without attachments.

    The attachment does NOT survive DataFrame transformations (each
    returns a fresh object), so ``release_checkpoints(None)`` releases
    EVERYTHING this module still has pinned — the right call at a
    session drain point when only derived frames are in hand.

    Implementation note: ``DataFrame.unpersist()`` only drops
    cacheManager entries, NOT the RDD blocks backing a localCheckpoint
    — each attachment's LogicalRDD id is read off its own analyzed
    plan and unpersisted at the RDD layer (the connected_components
    pattern; never a persistent-RDD-set diff, which could destroy a
    concurrent job's blocks)."""
    targets: list[tuple[SparkSession, int]]
    if df is None:
        targets = list(_LIVE_CHECKPOINTS)
        _LIVE_CHECKPOINTS.clear()
    else:
        cps = getattr(df, "_sg_checkpoints", ())
        if not cps and _LIVE_CHECKPOINTS:
            import warnings

            warnings.warn(
                "release_checkpoints: this DataFrame carries no "
                "checkpoint attachments (the attribute dies on any "
                "transformation — you are likely holding a DERIVED "
                f"frame) while {len(_LIVE_CHECKPOINTS)} checkpoint(s) "
                "remain pinned. Pass the operator's ORIGINAL result, or "
                "release_checkpoints(None) at a session drain point.",
                stacklevel=2,
            )
        targets = []
        for c in cps:
            try:
                targets.append((c.sparkSession, _checkpoint_rdd_id(c)))
            except Exception:
                pass
        live = {(id(s), rid) for s, rid in targets}
        _LIVE_CHECKPOINTS[:] = [
            (s, rid) for s, rid in _LIVE_CHECKPOINTS
            if (id(s), rid) not in live
        ]
    if not targets:
        return
    from .dedup import _quiet_truncated_lineage_warns

    restore = _quiet_truncated_lineage_warns(targets[0][0])
    try:
        for session, rid in targets:
            try:
                m = session.sparkContext._jsc.getPersistentRDDs()
                if m.containsKey(rid):
                    m.get(rid).unpersist(False)
            except Exception:
                pass  # hygiene only — never fail the caller over release
    finally:
        restore()


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """zlib compression ratio per document — the classic redundancy /
    boilerplate signal of web-corpus pipelines (CCNet, RefinedWeb):
    highly repetitive or templated text compresses far below natural
    prose; random noise barely compresses at all. Reported as
    fixed-point ``ratio_pm`` = floor(1000 * compressed_len /
    original_len) plus both byte counts.

    Arrow-batched pandas UDF (zlib is CPython stdlib, deterministic for
    a pinned level) — a pure map stage, embarrassingly parallel at any
    scale. Not SQL-expressible, so the spec runs the driver's rows-only
    check; the unit test pins exact values against direct zlib calls.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _zlen_fn(s: pd.Series) -> pd.Series:
        import zlib

        return s.map(
            lambda x: len(zlib.compress(x.encode("utf-8"), 6))
            if x is not None
            else None
        )

    # explicit annotations (locals-scoped 'pd' defeats the string-hint
    # resolver that @pandas_udf uses on decorated defs)
    _zlen_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _zlen = pandas_udf(_zlen_fn, "long")

    t = F.col(text_col)
    # octet_length, not length: the zlib numerator measures UTF-8 BYTES,
    # so a character-count denominator would rank incompressible
    # multibyte prose (3 bytes/char) above ASCII boilerplate — the
    # inverse of the documented ordering. greatest(1) keeps the empty
    # document defined (zlib emits 8 header bytes for it).
    return df.select(
        F.col(id_col),
        F.octet_length(t).cast("bigint").alias("n_bytes_raw"),
        _zlen(t).alias("n_bytes_zlib"),
    ).withColumn(
        "ratio_pm",
        F.expr(
            "CAST(n_bytes_zlib * 1000 AS BIGINT) div greatest(n_bytes_raw, 1)"
        ),
    )
