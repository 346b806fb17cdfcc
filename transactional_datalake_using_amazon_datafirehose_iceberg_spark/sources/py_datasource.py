"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The reference's ingest edge is a managed transport (Kinesis →
Firehose, cdk_stacks/firehose_to_iceberg.py:121-130); this wraps the
same golden CDC envelope corpus as a FIRST-CLASS pluggable Spark
source: `spark.read.format("cdc_envelopes")` yields the one-string-
column ``value`` contract every downstream stage (transform T1-T7,
apply D1-D6) already consumes — demonstrating how a real transport
(an HTTP puller, a queue consumer) plugs into the engine without
touching the pipeline.

The envelope lines are materialized driver-side (metadata scale) and
shipped inside the InputPartition, so executors need no package
imports; each corpus is one partition (parallel read, per-corpus
ordering preserved within a partition as Kinesis preserves per-shard
order)."""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class CdcEnvelopeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_envelopes"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> "DataSourceReader":
        from .cdc_jsonl import golden_corpora

        insert_only, dml = golden_corpora()
        return _CdcEnvelopeReader(
            [
                [json.dumps(e) for e in insert_only],
                [json.dumps(e) for e in dml],
            ]
        )


class _CdcEnvelopeReader(DataSourceReader):
    def __init__(self, corpora: list[list[str]]):
        self._corpora = corpora

    def partitions(self):
        # one partition per corpus; lines ride inside the partition value
        return [InputPartition(lines) for lines in self._corpora]

    def read(self, partition):
        for line in partition.value:
            yield (line,)
