"""Table maintenance — the reference's compaction/retention story.

Reference: ``optimize_rewrite_delete_file_threshold=10`` (README.md:307)
bounds merge-on-read amplification; OSS Iceberg exposes this as
``rewrite_data_files`` procedures with no auto-trigger (SURVEY.md §4 O7).
This engine is copy-on-write, so the analogous degradation is *small
files* accumulating across micro-batch commits; ``compact`` rewrites the
live file set into target-sized files, and ``expire_snapshots`` retires
history + unreferenced data files (Iceberg ``expire_snapshots``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from .lake_table import LakeTable, _SNAPSHOT_DIR


DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def should_compact(table: LakeTable, small_file_threshold: int = 10,
                   small_bytes: int = 8 * 1024 * 1024) -> bool:
    """Auto-trigger policy (the piece OSS Iceberg leaves to the user):
    compact once >= N live files are below the small-file size."""
    m = table.manifest()
    small = [f for f in m["files"] if f["bytes"] < small_bytes]
    return len(small) >= small_file_threshold


def compact(
    spark: SparkSession,
    table: LakeTable,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite the live file set into ~target-sized, cluster-sorted files
    in one atomic snapshot (like CALL rewrite_data_files)."""
    m = table.manifest()
    if not m["files"]:
        return m["version"]
    total_bytes = sum(f["bytes"] for f in m["files"])
    n_out = max(1, int(total_bytes // target_file_bytes) + (1 if total_bytes % target_file_bytes else 0))
    df = table.read(spark)
    cb = table.cluster_by
    if cb:
        df = df.repartition(n_out, *cb).sortWithinPartitions(*cb)
    else:
        df = df.coalesce(n_out)
    import uuid

    commit_dir = os.path.join(table.root, "data", uuid.uuid4().hex[:16])
    table._conform(df).write.mode("errorifexists").parquet(commit_dir)
    added = table._collect_stats(commit_dir)
    return table.commit(
        added,
        removed_paths=[f["path"] for f in m["files"]],
        operation="compact",
    )


def expire_snapshots(table: LakeTable, keep_last: int = 2) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and physically
    delete data files no surviving snapshot references."""
    snap_dir = os.path.join(table.root, _SNAPSHOT_DIR)
    names = sorted(os.listdir(snap_dir))
    if len(names) <= keep_last:
        return {"removed_snapshots": 0, "removed_files": 0}
    to_drop, to_keep = names[:-keep_last], names[-keep_last:]
    keep_refs: set[str] = set()
    for n in to_keep:
        with open(os.path.join(snap_dir, n)) as f:
            keep_refs.update(fm["path"] for fm in json.load(f)["files"])
    removed_files = 0
    for n in to_drop:
        p = os.path.join(snap_dir, n)
        with open(p) as f:
            refs = [fm["path"] for fm in json.load(f)["files"]]
        for r in refs:
            if r not in keep_refs:
                fp = os.path.join(table.root, r)
                if os.path.exists(fp):
                    os.remove(fp)
                    removed_files += 1
        os.remove(p)
    return {"removed_snapshots": len(to_drop), "removed_files": removed_files}
