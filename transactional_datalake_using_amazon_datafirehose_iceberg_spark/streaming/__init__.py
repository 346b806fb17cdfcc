"""Structured Streaming surface: CDC ingest pipeline + stream analytics."""

from .pipeline import CdcStreamPipeline

__all__ = ["CdcStreamPipeline"]
