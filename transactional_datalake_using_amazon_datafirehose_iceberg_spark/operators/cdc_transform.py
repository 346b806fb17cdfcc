"""CDC envelope transform — T1–T7 of SURVEY.md §2.2, as a pure DataFrame
program.

Re-expresses the reference's Lambda record transformer
(src/main/python/firehose_to_iceberg_transformer.py:14-47) — the only
first-party dataflow code in the reference — with these pinned
semantics:

- **T1 base64 decode** (transformer:18): optional here; the JSONL file
  source delivers plain text. ``decode_base64`` is provided for
  transports that wrap payloads (Firehose does).
- **T2 JSON parse** (transformer:19): ``from_json`` in PERMISSIVE mode;
  a malformed line yields a null struct instead of failing the batch.
- **T3 projection** (transformer:21-24): ``data`` is re-serialized
  *verbatim* — no type coercion, no column selection; unknown fields in
  ``data`` flow through to the writer (transformer:22,33). We therefore
  parse the envelope with ``data`` typed as a raw JSON string.
- **T4 malformed filter** (transformer:25-27): drop ≠ fail. Records
  missing data/metadata/operation are split to the dead-letter side with
  the original payload (generalizing the reference, which logs and
  drops; delivery failures land in the S3 error prefix — S9,
  firehose_to_iceberg.py:97,118).
- **T5 operation whitelist** (transformer:29-30): keep only
  insert/update/delete; DMS control records vanish *silently* — they are
  dropped, not dead-lettered. Note the Lambda never inspects
  ``schema-name``/``table-name`` (transformer:21-30), so the dirty
  leading-space table name record survives (FIXTURES.md §A3) — pinned in
  tests.
- **T6 routing annotation** (transformer:32-43): attach destination
  database/table (static config, env vars in the reference
  firehose_data_proc_lambda.py:32-35).
- **T7 re-encode** (transformer:33,45-47): unnecessary — the result
  stays a DataFrame.

Scale: every step is a built-in JVM expression (``from_json``, filters,
literals) inside one whole-stage-codegen span — no Python in the hot
path, no shuffle. An optional ``mapInPandas`` plugin hook mirrors the
Lambda extension point (firehose_to_iceberg.py:41-75 wires an arbitrary
processor).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CDC_ENVELOPE_RAW

DML_OPS = ("insert", "update", "delete")


def decode_base64(df: DataFrame, col: str = "value") -> DataFrame:
    """T1 — base64-wrapped payloads (transformer:18).

    ``try_to_binary(..., 'base64')``, not ``unbase64``: one invalid
    line made unbase64 throw java.lang.IllegalArgumentException inside
    codegen and KILL the whole task (review round 10). Invalid base64
    decodes to NULL and the ORIGINAL line is kept, so the record
    dead-letters downstream with its raw transport payload intact
    (T4's recoverability contract) instead of crashing the batch."""
    decoded = F.try_to_binary(F.col(col), F.lit("base64")).cast("string")
    return df.withColumn(col, F.coalesce(decoded, F.col(col)))


def transform(
    df: DataFrame,
    destination_database: str,
    destination_table: str | None,
    value_col: str = "value",
    plugin: Callable[[DataFrame], DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """T2–T6: raw JSONL lines -> (good, dead).

    ``good`` columns: ``data`` (raw JSON string, pass-through fidelity),
    ``operation``, ``metadata`` (typed struct), ``destination_database``,
    ``destination_table``.
    ``dead`` columns: ``raw``, ``error_type`` (+ caller adds time
    partitions via :func:`to_dead_letter`).

    ``destination_table=None`` derives the destination from each
    record's OWN ``metadata.table-name``, verbatim (dirty-name
    fidelity) — exactly what the reference transformer does
    (firehose_to_iceberg_transformer.py:65-71 builds otfMetadata from
    the record's schema/table name), enabling one mixed delivery to
    fan out to several tables via :func:`~..operators.cdc_apply.apply_routed`.
    """
    parsed = df.withColumn("v", F.from_json(F.col(value_col), CDC_ENVELOPE_RAW))

    # T5 first in predicate order (mirrors the Lambda's control flow:
    # extraction succeeds for control records, the whitelist then drops
    # them silently — transformer:21-30); T4 dead-letters only records
    # that are unparseable / missing pieces *and* would otherwise be DML.
    is_dml = F.col("v.metadata.operation").isin(*DML_OPS)
    ok = (
        F.col("v").isNotNull()
        & F.col("v.metadata").isNotNull()
        & F.col("v.metadata.operation").isNotNull()
    )
    # routed mode derives the destination from the record itself, so a
    # DML record with NO table-name cannot be routed anywhere — it must
    # dead-letter (the managed service would land it in the error
    # prefix), never silently vanish between transform and apply_routed.
    # Scoped to DML so control records keep their silent-drop semantics.
    unroutable = (
        (is_dml & F.col("v.metadata.`table-name`").isNull())
        if destination_table is None
        else F.lit(False)
    )
    dead = (
        parsed.filter(~ok | (is_dml & F.col("v.data").isNull()) | (ok & unroutable))
        .select(
            F.col(value_col).alias("raw"),
            F.when(ok & unroutable, F.lit("transform-unroutable"))
            .otherwise(F.lit("transform-malformed"))
            .alias("error_type"),
        )
    )

    good = (
        parsed.filter(ok & F.col("v.data").isNotNull() & ~unroutable)
        # T5 — whitelist; control records dropped silently (NOT dead-lettered)
        .filter(is_dml)
        # T3 + T6 — project and annotate routing
        .select(
            F.col("v.data").alias("data"),
            F.col("v.metadata.operation").alias("operation"),
            F.col("v.metadata").alias("metadata"),
            F.lit(destination_database).alias("destination_database"),
            (
                F.lit(destination_table)
                if destination_table is not None
                else F.col("v.metadata.`table-name`")
            ).alias("destination_table"),
        )
    )
    if plugin is not None:
        good = plugin(good)
    return good, dead


def to_dead_letter(dead: DataFrame, ts_col=None) -> DataFrame:
    """Shape dead records like the reference's S3 error prefix:
    ``error/year=!{timestamp:yyyy}/month=…/day=…/hour=…/<error-type>``
    (README.md:82) — partition columns derived from delivery time."""
    ts = ts_col if ts_col is not None else F.current_timestamp()
    return dead.select(
        "raw",
        "error_type",
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.hour(ts).alias("hour"),
    )


def split_schema_drift(
    good: DataFrame,
    table_schema,
    data_col: str = "data",
) -> tuple[DataFrame, DataFrame]:
    """Schema-drift gate between transform and apply: split records
    whose payload carries columns the destination table does not have.

    The managed pipeline has exactly two answers to a drifted record —
    land it in the S3 error prefix (schema mismatch at the Iceberg
    destination, README.md:82) or evolve the destination first (DMS
    forwards upstream DDL). This gate makes the policy explicit:
    ``clean`` rows apply as usual; ``drifted`` rows go to the caller's
    choice of :func:`quarantine_drifted` (dead-letter shape, error_type
    ``schema-drift``) or ``merge_into(..., evolve_schema=True)``
    (evolve — the unknown columns become table columns, earlier rows
    read NULL).

    Detection is ONE ``json_object_keys`` pass over the payload —
    JVM-side, no shuffle, linear in batch size; the schema's name set
    is a plan-time literal (metadata scale).

    A payload that is not a parseable JSON object yields NULL from
    ``json_object_keys`` (and so NULL from ``exists``) — such a row
    goes to ``drifted`` (quarantine-able), never silently vanishes
    from BOTH outputs (round-9 advice): the split is a partition of
    its input, row for row."""
    names = [f.name for f in table_schema.fields]
    has_unknown = F.exists(
        F.json_object_keys(F.col(data_col)),
        lambda k: ~k.isin(*names),
    )
    clean = F.coalesce(~has_unknown, F.lit(False))
    return good.filter(clean), good.filter(~clean)


def quarantine_drifted(drifted: DataFrame, ts_col=None) -> DataFrame:
    """Shape :func:`split_schema_drift`'s ``drifted`` rows like the S3
    error prefix (to_dead_letter parity, error_type ``schema-drift``).
    Transformed rows carry data/operation/metadata columns, not the
    raw/error_type pair to_dead_letter selects — passing them there
    raised UNRESOLVED_COLUMN (review round 10); here the whole
    transformed record is re-serialized as ``raw``, so the quarantined
    row is replayable once the destination schema has evolved."""
    ts = ts_col if ts_col is not None else F.current_timestamp()
    return drifted.select(
        F.to_json(F.struct(*drifted.columns)).alias("raw"),
        F.lit("schema-drift").alias("error_type"),
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.hour(ts).alias("hour"),
    )
