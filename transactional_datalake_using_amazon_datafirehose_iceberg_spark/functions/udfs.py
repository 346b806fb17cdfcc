"""Vectorized UDF surface.

The slow-path discipline (SURVEY.md guidance): built-in functions first;
when user code is genuinely needed, Arrow-batched ``pandas_udf`` /
``applyInPandas`` — never row-at-a-time Python UDFs in a hot path. These
examples are deterministic arithmetic so they remain oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def quality_score_udf(text: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: a toy quality score =
    trunc6(unique_token_ratio * min(1, chars/200)). Truncation (floor),
    not round: numpy rounds half-even while SQL rounds half-away, so
    floor is the only bitwise-portable 6-dp normalization.

    NULL text scores NULL (review round 11: len(set(None)) raised
    TypeError, failing the whole job on one NULL row — the sibling
    text/corpus operators over the same documents table all take NULL
    in-contract, and this UDF is SQL-registered for arbitrary use)."""
    import numpy as np

    toks = text.str.split(" ")
    n = toks.str.len().clip(lower=1)
    uniq = toks.map(lambda t: len(set(t)), na_action="ignore")
    chars = text.str.len()
    raw = (uniq / n) * (chars / 200.0).clip(upper=1.0)
    # plain float64, not a nullable extension dtype: under Arrow the
    # str accessors return Int64/Float64 whose NA makes np.floor raise
    return np.floor(raw.astype("float64") * 1_000_000) / 1_000_000


@F.pandas_udf(T.DoubleType())
def weighted_avg_price_udaf(ep: pd.Series, qty: pd.Series) -> float:
    """Grouped-AGGREGATE pandas UDF (vectorized UDAF — the third member
    of the pandas-UDF family next to scalar and grouped-map): quantity-
    weighted average price.

    Exact-integer formulation for cross-engine determinism: prices are
    2-decimal, so cents*quantity sums are exact int64 on BOTH engines —
    summation ORDER cannot change the result (double summation would
    differ between pandas pairwise sum and SQL sequential sum). One
    final double division, floor-normalized to 4 dp.

    NULL/NaN pairs are skipped, matching SQL aggregate semantics
    (review round 11: NaN.astype(int64) silently produced INT64_MIN,
    corrupting the average with no error)."""
    import numpy as np

    ok = ep.notna().to_numpy() & qty.notna().to_numpy()
    cents = np.round(ep.to_numpy()[ok] * 100).astype("int64")
    q = np.round(qty.to_numpy()[ok]).astype("int64")
    num = int((cents * q).sum())
    den = int(q.sum()) * 100
    if den == 0:
        # NULL, not 0.0: a group with no valid pairs (or zero total
        # quantity) has NO weighted price — SQL's avg/sum-ratio returns
        # NULL there, and a real-looking 0.0 was indistinguishable from
        # free items downstream (review round 12)
        return None
    return float(np.floor(num / den * 10_000) / 10_000)


def zscore_per_group(df: DataFrame, group_col: str, value_col: str, id_col: str) -> DataFrame:
    """Grouped applyInPandas (UDTF-like): per-group z-score with the
    sample standard deviation. Demonstrates the grouped-map path; the
    same result is expressible with window functions (the oracle does)."""
    # derive the passthrough column types from the INPUT schema — the
    # API is fully parameterized, and hardcoded Long/String types made
    # any other id/group column type fail the Arrow conversion at
    # runtime (review round 12)
    in_types = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField(id_col, in_types[id_col]),
            T.StructField(group_col, in_types[group_col]),
            T.StructField("z", T.DoubleType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=1)
        z = (v - v.mean()) / sd if sd and sd > 0 else v * 0.0
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                "z": np.floor(z * 10_000) / 10_000,  # floor: portable 4-dp
            }
        )

    return df.groupBy(group_col).applyInPandas(per_group, out_schema)


def register_sql_udfs(spark: SparkSession) -> None:
    """Expose the UDFs to the SQL surface (spark.udf.register)."""
    spark.udf.register("quality_score", quality_score_udf)
