"""Text analysis operators (NORTH-STAR tier): quality stats, language ID,
token counting, document fingerprinting.

Everything is built from portable string arithmetic (length/replace
counting, md5) so each operator has an exact DuckDB oracle. All
expressions are JVM-side whole-stage-codegen — this whole family is a
single map stage at any scale (no shuffle except final aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _count_occurrences(col, needle: str):
    """# occurrences of needle via length arithmetic (portable)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Char/token counts, average token length, punctuation count,
    stopword ratio, and a simple quality gate."""
    t = F.col(text_col)
    n_tokens = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    return df.select(
        F.col(id_col),
        F.col("lang"),
        F.length(t).cast("bigint").alias("n_chars_q"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(
            F.length(F.replace(t, F.lit(" "), F.lit(""))) * 1.0 / n_tokens, 4
        ).cast("double").alias("avg_tok_len"),
        _count_occurrences(F.concat(F.lit(" "), F.lower(t), F.lit(" ")), " the ")
        .cast("bigint")
        .alias("n_the"),
        F.when((F.length(t) >= 50) & (n_tokens >= 10), 1).otherwise(0).alias("quality_ok"),
    )


# language -> marker words for the n-gram/stopword scoring heuristic
_LANG_MARKERS = {
    "en": (" the ", " and "),
    "es": (" el ", " la "),
    "de": (" der ", " und "),
    "fr": (" le ", " et "),
}


def lang_id_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word scoring language ID. Deterministic argmax with a
    fixed preference order on ties (en > es > de > fr)."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scored = df.select(
        F.col(id_col),
        F.col("lang").alias("actual_lang"),
        *[
            sum(_count_occurrences(padded, m) for m in markers)
            .cast("bigint")
            .alias(f"c_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    pred = (
        F.when(
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


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Two document fingerprints: exact (md5 of lowered text) and
    bag-of-words (md5 of the sorted token multiset) — the latter is
    order-invariant, catching shuffled near-dups."""
    lowered = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(lowered).alias("fp_exact"),
        F.md5(F.concat_ws(" ", F.sort_array(F.split(lowered, " ")))).alias("fp_bag"),
    )
