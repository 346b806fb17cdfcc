"""Declared StructTypes for every table and envelope the engine touches.

Schema discipline is fixed/declared (reference: the user creates the
Iceberg table before deploying Firehose, README.md:277-312; the Lambda
routes records without inspecting the payload schema,
src/main/python/firehose_to_iceberg_transformer.py:22,33). Schema
inference is a dev convenience only.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# retail_trans — query-visible (Iceberg DDL) schema.
# Reference: README.md:292-300. We mirror the Iceberg DDL, which narrows
# trans_id BIGINT→int at the MySQL boundary (README.md:219 vs :293); the
# DDL is the query-visible contract (SURVEY.md §7.3 item 3).
# --------------------------------------------------------------------------
RETAIL_TRANS = T.StructType(
    [
        T.StructField("trans_id", T.IntegerType(), False),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("event", T.StringType(), True),
        T.StructField("sku", T.StringType(), True),
        T.StructField("amount", T.IntegerType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("trans_datetime", T.TimestampType(), True),
    ]
)

# Partition column of the target table (README.md:301: PARTITIONED BY (event)).
RETAIL_TRANS_PARTITION = ["event"]
RETAIL_TRANS_KEYS = ["trans_id"]  # unique_keys, .example.cdk.context.json:22-24

# --------------------------------------------------------------------------
# CDC envelope — DMS JSON, one object per row-level DML.
# Reference shape: src/utils/gen_fake_cdc_data.py:28 (data + metadata);
# metadata fields: timestamp, record-type, operation, partition-key-type,
# schema-name, table-name, transaction-id.
# `data` is kept as raw JSON STRING at the envelope level because the
# reference's transformer passes it through opaquely without type coercion
# (firehose_to_iceberg_transformer.py:22,33) — unknown fields must survive.
# --------------------------------------------------------------------------
CDC_METADATA = T.StructType(
    [
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("record-type", T.StringType(), True),
        T.StructField("operation", T.StringType(), True),
        T.StructField("partition-key-type", T.StringType(), True),
        T.StructField("schema-name", T.StringType(), True),
        T.StructField("table-name", T.StringType(), True),
        T.StructField("transaction-id", T.LongType(), True),
    ]
)

# Envelope with `data` as an untyped JSON string (pass-through fidelity).
CDC_ENVELOPE_RAW = T.StructType(
    [
        T.StructField("data", T.StringType(), True),
        T.StructField("metadata", CDC_METADATA, True),
    ]
)

# Envelope with `data` parsed to the retail_trans row image (ingest typing).
# trans_datetime arrives as an ISO-8601 'Z' string
# (firehose_to_iceberg_transformer.py:62) and is cast on apply.
CDC_DATA_RETAIL = T.StructType(
    [
        T.StructField("trans_id", T.IntegerType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("event", T.StringType(), True),
        T.StructField("sku", T.StringType(), True),
        T.StructField("amount", T.IntegerType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("trans_datetime", T.StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# Dead-letter record (reference: only-failed S3 backup under
# error/year=.../month=.../day=.../hour=.../<error-output-type>;
# cdk_stacks/firehose_to_iceberg.py:97,113,118 and README.md:82).
# --------------------------------------------------------------------------
DEAD_LETTER = T.StructType(
    [
        T.StructField("raw", T.StringType(), True),
        T.StructField("error_type", T.StringType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("day", T.IntegerType(), True),
        T.StructField("hour", T.IntegerType(), True),
    ]
)

# --------------------------------------------------------------------------
# Driver fixture tables (/root/testdata/sf*/; FIXTURES.md §B).
# events.ts is TIMESTAMP(NANOS) in the parquet — with
# spark.sql.legacy.parquet.nanosAsLong=true it reads as LongType and the
# loader converts to TimestampType (µs, floor) to match DuckDB.
# --------------------------------------------------------------------------
FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

EMBEDDING_DIM = 64
