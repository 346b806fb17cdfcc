"""Transactional table format + physical-plan-level helpers.

``lake_table``: snapshot-versioned Parquet table (atomic commits, file
stats pruning, time travel). ``merge``: copy-on-write MERGE INTO.
``maintenance``: compaction + snapshot expiry (reference analogue:
``optimize_rewrite_delete_file_threshold``, README.md:307).
"""

from .lake_table import LakeTable, Predicate
from .merge import merge_into

__all__ = ["LakeTable", "Predicate", "merge_into"]
