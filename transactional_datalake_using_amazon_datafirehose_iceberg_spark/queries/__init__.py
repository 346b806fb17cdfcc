"""Declared query surface — the SURVEY.md §2 contract.

Each :class:`QuerySpec` pairs a Spark build (DataFrame program or SQL)
with a DuckDB oracle SQL string; the driver hash-compares them at
sf0.01. Where the query is expressible in dialect-portable ANSI SQL the
*same string* runs on both engines (strongest parity); DataFrame-API
operators get hand-written oracles.
"""

from .registry import QUERY_SPECS, get_queries, get_oracle_sql

__all__ = ["QUERY_SPECS", "get_queries", "get_oracle_sql"]
