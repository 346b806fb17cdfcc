"""Sources: fixture-table catalog + CDC JSONL batch/stream source +
custom Python Data Source (Spark 4 API)."""

from .catalog import load_table, register_views
from .cdc_jsonl import read_cdc_batch, read_cdc_stream, write_golden_corpus
from .lake_stream import LakeStreamDataSource
from .py_datasource import CdcEnvelopeDataSource

__all__ = [
    "load_table",
    "register_views",
    "read_cdc_batch",
    "read_cdc_stream",
    "write_golden_corpus",
    "CdcEnvelopeDataSource",
    "LakeStreamDataSource",
]
