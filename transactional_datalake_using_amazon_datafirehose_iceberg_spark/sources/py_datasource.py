"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The reference's ingest edge is a managed transport (Kinesis →
Firehose, cdk_stacks/firehose_to_iceberg.py:121-130); this wraps the
same golden CDC envelope corpus as a FIRST-CLASS pluggable Spark
source: `spark.read.format("cdc_envelopes")` yields the one-string-
column ``value`` contract every downstream stage (transform T1-T7,
apply D1-D6) already consumes — demonstrating how a real transport
(an HTTP puller, a queue consumer) plugs into the engine without
touching the pipeline.

The envelope lines are materialized driver-side (metadata scale,
inside ``partitions()``) and shipped ONLY in each InputPartition — the
reader instance itself keeps no corpus state, because PySpark pickles
the reader into every read task in ADDITION to the task's partition
value; corpus-on-the-reader would double-ship the payload (review
round 11 — this file is the documented template for real transports).
Each corpus is one partition (parallel read, per-corpus ordering
preserved within a partition as Kinesis preserves per-shard order)."""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = "value string"


class CdcEnvelopeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_envelopes"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "DataSourceReader":
        # a user-supplied .schema(...) would otherwise be accepted at
        # plan time and fail as an opaque per-task arity/type error —
        # the envelope contract is exactly one string column (r11)
        names = [f.name for f in schema.fields]
        types = [f.dataType.simpleString() for f in schema.fields]
        if names != ["value"] or types != ["string"]:
            raise ValueError(
                "cdc_envelopes emits the one-string-column envelope "
                f"contract ({_SCHEMA!r}); do not override it with "
                f".schema(...) — got {', '.join(f'{n} {t}' for n, t in zip(names, types))}"
            )
        return _CdcEnvelopeReader()


class _CdcEnvelopeReader(DataSourceReader):
    def partitions(self):
        # corpora built HERE (driver-side), riding only in the
        # partition values — never on the (task-pickled) reader
        import json

        from .cdc_jsonl import golden_corpora

        insert_only, dml = golden_corpora()
        return [
            InputPartition([json.dumps(e) for e in insert_only]),
            InputPartition([json.dumps(e) for e in dml]),
        ]

    def read(self, partition):
        for line in partition.value:
            yield (line,)
