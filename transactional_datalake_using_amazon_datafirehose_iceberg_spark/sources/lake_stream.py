"""LakeTable as a Structured Streaming SOURCE (Spark 4
``pyspark.sql.datasource`` streaming API) — Iceberg streaming-read
parity (`spark.readStream.format("iceberg")`): each micro-batch reads
the data files APPENDED since the last committed offset, giving
downstream incremental consumers exactly-once file-level progress
through the normal checkpoint mechanism.

Offsets are snapshot versions (the natural monotone watermark of the
format). Partition planning walks the manifest chain driver-side
(metadata scale); each appended data file becomes one InputPartition
and executors read their file with pyarrow directly, yielding Arrow
record batches — no Spark jobs inside the reader, no driver
materialization of row data, no row-at-a-time Python.

Semantics match Iceberg's defaults for streaming reads:

- append and merge fast-path commits (added files, nothing removed)
  stream their added files;
- a commit that REWRITES or DELETES data (COW merge/update/delete,
  overwrite, new MOR delete files) is not expressible as an append
  stream — it raises, unless ``skipChangeCommits`` is set (Iceberg's
  ``streaming-skip-overwrite/delete-snapshots``), in which case the
  commit is skipped whole;
- maintenance commits (compact / zorder / rewrite-deletes) rewrite
  existing rows and are always skipped, like Iceberg's
  replace-snapshot handling; metadata-only commits carry no rows.

Row-level change streams (UPDATE/DELETE images) remain the batch
``changelog()`` read — the same split Iceberg makes between streaming
reads and the changelog procedure.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_APPEND_OPS = {"append", "merge"}
_MAINTENANCE_OPS = {"compact", "zorder", "rewrite-deletes"}


def _read_pointer(root: str) -> int:
    with open(os.path.join(root, "_current")) as f:
        return int(f.read().strip())


def _read_manifest(root: str, version: int) -> dict:
    with open(os.path.join(root, "_snapshots", f"v{version:012d}.json")) as f:
        return json.load(f)


class LakeStreamDataSource(DataSource):
    """``spark.readStream.format("lake_table").option("path", root)``."""

    @classmethod
    def name(cls) -> str:
        return "lake_table"

    def schema(self):
        root = self.options.get("path")
        if not root:
            raise ValueError("lake_table source requires .option('path', <table root>)")
        m = _read_manifest(root, _read_pointer(root))
        return T.StructType.fromJson(json.loads(m["schema"]))

    def streamReader(self, schema) -> "DataSourceStreamReader":
        return _LakeStreamReader(
            self.options["path"],
            schema,
            skip_change_commits=str(
                self.options.get("skipChangeCommits", "false")
            ).lower()
            == "true",
        )


class _FilePartition(InputPartition):
    def __init__(self, abs_path: str, arrow_schema):
        self.abs_path = abs_path
        self.arrow_schema = arrow_schema  # pyarrow schemas pickle fine


class _LakeStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: T.StructType, skip_change_commits: bool):
        from pyspark.sql.pandas.types import to_arrow_schema

        self._root = root
        self._arrow_schema = to_arrow_schema(schema)
        self._skip_change_commits = skip_change_commits

    # -- offsets --------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": _read_pointer(self._root)}

    def partitions(self, start: dict, end: dict):
        chain: list[dict] = []
        v: int | None = end["version"]
        while v is not None and v > start["version"]:
            m = _read_manifest(self._root, v)
            chain.append(m)
            v = m["parent"]
        chain.reverse()
        parts: list[_FilePartition] = []
        for m in chain:
            op = m["summary"].get("operation")
            if op in _MAINTENANCE_OPS:
                continue  # row-preserving rewrite: nothing new to stream
            added = int(m["summary"].get("added_files", 0))
            removed = int(m["summary"].get("removed_files", 0))
            if op not in _APPEND_OPS and added == 0 and removed == 0:
                continue  # metadata-only commit (DDL, refs): no rows
            prev = _read_manifest(self._root, m["parent"])
            new_deletes = {d["path"] for d in m.get("delete_files", [])} - {
                d["path"] for d in prev.get("delete_files", [])
            }
            if op not in _APPEND_OPS or removed or new_deletes:
                if self._skip_change_commits:
                    continue
                raise ValueError(
                    f"lake_table streaming read hit a non-append commit "
                    f"(v{m['version']}, op={op}, removed_files={removed}, "
                    f"new_delete_files={len(new_deletes)}); row-level "
                    "changes need the batch changelog() read, or set "
                    ".option('skipChangeCommits', 'true') to stream past it"
                )
            prev_files = {f["path"] for f in prev["files"]}
            for fmeta in m["files"]:
                if fmeta["path"] not in prev_files:
                    parts.append(
                        _FilePartition(
                            os.path.join(self._root, fmeta["path"]),
                            self._arrow_schema,
                        )
                    )
        return parts

    def read(self, partition: _FilePartition):
        # executor-side: one parquet file via pyarrow, emitted as Arrow
        # record batches cast to the head schema (a pre-widening file's
        # int32 promotes; a pre-add-column file's missing column nulls)
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = partition.arrow_schema
        pf = pq.ParquetFile(partition.abs_path)
        phys = set(pf.schema_arrow.names)
        cols = [f.name for f in target if f.name in phys]
        for batch in pf.iter_batches(columns=cols):
            arrays = []
            for field in target:
                if field.name in phys:
                    arrays.append(
                        batch.column(cols.index(field.name)).cast(field.type)
                    )
                else:
                    arrays.append(pa.nulls(batch.num_rows, type=field.type))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in target]
            )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing to release
