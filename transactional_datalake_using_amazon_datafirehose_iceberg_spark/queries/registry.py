"""Assembles the full declared query surface from the per-domain modules."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import QuerySpec


def _all_specs() -> list[QuerySpec]:
    from . import relational

    specs: list[QuerySpec] = []
    specs.extend(relational.SPECS)
    try:
        from . import llmops

        specs.extend(llmops.SPECS)
    except ImportError:
        pass
    try:
        from . import cdcops

        specs.extend(cdcops.SPECS)
    except ImportError:
        pass
    try:
        from . import extended

        specs.extend(extended.SPECS)
    except ImportError:
        pass
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    return specs


QUERY_SPECS: dict[str, QuerySpec] = {s.name: s for s in _all_specs()}


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""

    def _mk(spec: QuerySpec):
        return lambda spark, sf_dir: spec.run_spark(spark, sf_dir)

    return {name: _mk(spec) for name, spec in QUERY_SPECS.items()}


def get_oracle_sql() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (omit non-SQL-expressible)."""
    out: dict[str, str] = {}
    for name, spec in QUERY_SPECS.items():
        o = spec.oracle_text()
        if o is not None:
            out[name] = o
    return out
