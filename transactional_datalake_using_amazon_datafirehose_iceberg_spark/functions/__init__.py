"""User-defined function surface (SURVEY.md §2.5 UDF/UDAF/UDTF):
vectorized pandas UDFs and grouped applyInPandas examples, mirroring the
reference's Lambda extension point (an arbitrary processor plugged into
the pipeline, cdk_stacks/firehose_to_iceberg.py:41-75)."""

from .udfs import quality_score_udf, register_sql_udfs, zscore_per_group

__all__ = ["quality_score_udf", "register_sql_udfs", "zscore_per_group"]
