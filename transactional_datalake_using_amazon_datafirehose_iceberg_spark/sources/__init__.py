"""Sources: fixture-table catalog + CDC JSONL batch/stream source."""

from .catalog import load_table, register_views
from .cdc_jsonl import read_cdc_batch, read_cdc_stream, write_golden_corpus

__all__ = ["load_table", "register_views", "read_cdc_batch", "read_cdc_stream", "write_golden_corpus"]
