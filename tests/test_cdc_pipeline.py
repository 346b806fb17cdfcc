"""CDC transform (T1-T7) + apply (D1-D5) against the golden corpora.

Pinned behaviors (SURVEY.md §2.2/§2.3, FIXTURES.md §A3):
- malformed records never fail the batch, they dead-letter (T4);
- non-DML control records vanish silently (T5);
- the transformer never inspects schema-name/table-name, so the dirty
  leading-space table-name record (key 41) survives -> final count 12;
- the corrupt hour-29 metadata timestamp (key 47) still applies;
- replaying a batch is idempotent (D1).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
    apply_batch,
    collapse_latest_per_key,
    typed_rows,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_transform import (
    decode_base64,
    to_dead_letter,
    transform,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import LakeTable
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (
    RETAIL_TRANS,
    RETAIL_TRANS_KEYS,
    RETAIL_TRANS_PARTITION,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources.cdc_jsonl import (
    control_records,
    read_cdc_batch,
    write_golden_corpus,
)

DB, TBL = "cdc_iceberg_demo_db", "retail_trans_iceberg"


@pytest.fixture(scope="module")
def corpus_paths(tmp_path_factory):
    return write_golden_corpus(str(tmp_path_factory.mktemp("cdc")))


def _mk_table(tmp_path):
    return LakeTable.create(
        str(tmp_path / "retail"),
        RETAIL_TRANS,
        keys=RETAIL_TRANS_KEYS,
        cluster_by=RETAIL_TRANS_PARTITION,
    )


def test_transform_good_and_routing(spark, corpus_paths):
    p1, _ = corpus_paths
    good, dead = transform(read_cdc_batch(spark, p1), DB, TBL)
    rows = good.collect()
    assert len(rows) == 10
    assert all(r["destination_database"] == DB for r in rows)
    assert all(r["operation"] == "insert" for r in rows)
    assert dead.count() == 0
    # pass-through fidelity: data is the raw JSON string, untouched
    assert rows[0]["data"].strip().startswith("{")


def test_transform_malformed_dead_letters_but_does_not_fail(spark):
    lines = [
        ('{"data": {"trans_id": 1}, "metadata": {"operation": "insert", '
         '"timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data", '
         '"partition-key-type": "primary-key", "schema-name": "testdb", '
         '"table-name": "retail_trans", "transaction-id": 1}}',),
        ("this is not json at all",),
        ('{"metadata": {"operation": "insert"}}',),  # missing data
        ('{"data": {"trans_id": 2}}',),  # missing metadata
    ]
    df = spark.createDataFrame(lines, "value string")
    good, dead = transform(df, DB, TBL)
    assert good.count() == 1
    dl = to_dead_letter(dead)
    got = dl.collect()
    assert len(got) == 3
    assert {r["error_type"] for r in got} == {"transform-malformed"}
    assert all(r["year"] is not None for r in got)


def test_transform_drops_control_records_silently(spark):
    import json

    lines = [(json.dumps(e),) for e in control_records()]
    df = spark.createDataFrame(lines, "value string")
    good, dead = transform(df, DB, TBL)
    assert good.count() == 0
    assert dead.count() == 0  # dropped, NOT dead-lettered (T5 fidelity)


def test_transform_base64_path(spark):
    import base64
    import json

    payload = {"data": {"trans_id": 5}, "metadata": {
        "timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data",
        "operation": "insert", "partition-key-type": "primary-key",
        "schema-name": "testdb", "table-name": "retail_trans", "transaction-id": 9}}
    b64 = base64.b64encode(json.dumps(payload).encode()).decode()
    df = decode_base64(spark.createDataFrame([(b64,)], "value string"))
    good, _ = transform(df, DB, TBL)
    assert good.count() == 1


def test_collapse_latest_per_key(spark):
    df = spark.createDataFrame(
        [
            (1, "old", "2023-01-16T06:00:00.000001Z", 10),
            (1, "new", "2023-01-16T07:00:00.000001Z", 11),
            (2, "corrupt-ts-loses", None, 99),
            (2, "valid-ts-wins", "2023-01-16T06:30:00.000001Z", 5),
            (3, "only", None, 1),
        ],
        "trans_id int, tag string, ts string, txn long",
    ).select(
        "trans_id", "tag",
        F.try_to_timestamp("ts").alias("_order_ts"),
        F.col("txn").alias("_order_txn"),
    )
    got = {r["trans_id"]: r["tag"] for r in collapse_latest_per_key(df, ["trans_id"]).collect()}
    assert got == {1: "new", 2: "valid-ts-wins", 3: "only"}


def test_cdc_end_to_end_golden_replay(spark, tmp_path, corpus_paths):
    """Reference acceptance: replay both corpora -> 12 live rows
    (README.md:400-460; FIXTURES.md §A3 item 4)."""
    p1, p2 = corpus_paths
    table = _mk_table(tmp_path)

    for p in (p1, p2):
        good, _dead = transform(read_cdc_batch(spark, p), DB, TBL)
        apply_batch(table, typed_rows(good))

    final = table.read(spark)
    rows = {r["trans_id"]: r for r in final.collect()}
    assert len(rows) == 12
    assert set(rows) == {19, 21, 24, 27, 28, 30, 35, 37, 38, 41, 43, 47}
    # updated amounts applied (full after-image replace)
    for k, amt in [(19, 39), (21, 60), (24, 42), (30, 67), (35, 85)]:
        assert rows[k]["amount"] == amt, k
    # deleted keys gone
    assert not {6, 23, 33} & set(rows)
    # dirty records survived: leading-space table name (41), hour-29 ts (47)
    assert 41 in rows and 47 in rows
    # the reference's own acceptance query (README.md:456-460)
    final.createOrReplaceTempView("retail_trans_iceberg")
    assert spark.sql("SELECT COUNT(*) AS cnt FROM retail_trans_iceberg").collect()[0]["cnt"] == 12


def test_cdc_replay_idempotent(spark, tmp_path, corpus_paths):
    """D1: re-applying a micro-batch is a no-op (Firehose retry safety,
    firehose_to_iceberg.py:52-54)."""
    p1, p2 = corpus_paths
    table = _mk_table(tmp_path)
    for p in (p1, p2, p2):  # second corpus applied twice
        good, _ = transform(read_cdc_batch(spark, p), DB, TBL)
        apply_batch(table, typed_rows(good))
    assert table.read(spark).count() == 12


def test_null_key_rows_dropped_at_apply(spark, tmp_path):
    """A 'data' payload that is valid JSON but carries no trans_id (e.g.
    a foreign table's row) must not upsert a null-key row."""
    import json

    table = _mk_table(tmp_path)
    envs = [
        {"data": {"foo": 1},  # no trans_id
         "metadata": {"timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data",
                      "operation": "insert", "partition-key-type": "primary-key",
                      "schema-name": "testdb", "table-name": "other_table",
                      "transaction-id": 1}},
        {"data": {"trans_id": 5, "customer_id": "c", "event": "visit", "sku": "s",
                  "amount": 1, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"},
         "metadata": {"timestamp": "2023-01-16T06:00:01.000001Z", "record-type": "data",
                      "operation": "insert", "partition-key-type": "primary-key",
                      "schema-name": "testdb", "table-name": "retail_trans",
                      "transaction-id": 2}},
    ]
    df = spark.createDataFrame([(json.dumps(e),) for e in envs], "value string")
    good, _ = transform(df, DB, TBL)
    apply_batch(table, typed_rows(good))
    rows = table.read(spark).collect()
    assert len(rows) == 1 and rows[0]["trans_id"] == 5


def test_delete_never_seen_key_noop(spark, tmp_path):
    """CDC stream starting mid-history (migration_type='cdc'):
    delete of an unknown key must silently no-op (SURVEY §7.3 item 2)."""
    import json

    table = _mk_table(tmp_path)
    env = {
        "data": {"trans_id": 777, "customer_id": "x", "event": "visit", "sku": "s",
                 "amount": 1, "device": "pc", "trans_datetime": "2023-01-16T06:00:00Z"},
        "metadata": {"timestamp": "2023-01-16T06:00:00.000001Z", "record-type": "data",
                     "operation": "delete", "partition-key-type": "primary-key",
                     "schema-name": "testdb", "table-name": "retail_trans",
                     "transaction-id": 1},
    }
    df = spark.createDataFrame([(json.dumps(env),)], "value string")
    good, _ = transform(df, DB, TBL)
    apply_batch(table, typed_rows(good))
    assert table.read(spark).count() == 0


# ---------------------------------------------------------------------------
# Kafka transport shim: broker-free contract test — recorded Kafka-shaped
# frames through the frame->envelope parse path must be envelope-identical
# to the JSONL file transport on the same golden corpus (round-4 advice).
# ---------------------------------------------------------------------------


def test_kafka_frame_parse_matches_jsonl_transport(spark, corpus_paths):
    import json as _json

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources.cdc_jsonl import (
        KAFKA_FRAME_DDL,
        kafka_frames_to_envelopes,
        read_cdc_batch,
    )

    p1, p2 = corpus_paths
    lines = []
    for p in (p1, p2):
        with open(p) as f:
            lines.extend(ln.rstrip("\n") for ln in f if ln.strip())

    # fabricate the stock Kafka source row shape: envelope JSON as the
    # record value, primary key as the message key (DMS/Kinesis parity)
    def _key(ln):
        try:
            return str(_json.loads(ln)["data"].get("trans_id", "")).encode()
        except Exception:
            return b""

    frames = spark.createDataFrame(
        [
            (_key(ln), ln.encode("utf-8"), "cdc", i % 3, i, None, 0)
            for i, ln in enumerate(lines)
        ],
        KAFKA_FRAME_DDL,
    )
    via_kafka = kafka_frames_to_envelopes(frames)
    assert via_kafka.columns == ["value"]  # the shared transport contract

    via_file = read_cdc_batch(spark, p1).unionByName(read_cdc_batch(spark, p2))
    assert sorted(r["value"] for r in via_kafka.collect()) == sorted(
        r["value"] for r in via_file.collect()
    )

    # and the parsed envelopes drive the SAME downstream outcome
    good_k, dead_k = transform(via_kafka, DB, TBL)
    good_f, dead_f = transform(via_file, DB, TBL)
    assert good_k.count() == good_f.count()
    assert dead_k.count() == dead_f.count()
    k_rows = sorted(map(tuple, typed_rows(good_k).collect()))
    f_rows = sorted(map(tuple, typed_rows(good_f).collect()))
    assert k_rows == f_rows


def test_transform_routed_mode_dead_letters_unroutable(spark):
    """destination_table=None (metadata-derived routing): a DML record
    whose envelope carries NO table-name cannot be routed — it must
    dead-letter as transform-unroutable, never silently vanish between
    transform and apply_routed. Control records without a table-name
    keep their silent drop, and the fixed-destination mode still
    applies such records (destination is constant there)."""
    import json

    envelope = {
        "data": {"trans_id": 1},
        "metadata": {
            "operation": "insert",
            "timestamp": "2023-01-16T06:00:00.000001Z",
            "record-type": "data",
            "partition-key-type": "primary-key",
            "schema-name": "testdb",
            "table-name": None,
            "transaction-id": 1,
        },
    }
    control = {
        "data": {},
        "metadata": {
            "operation": "create-table",
            "timestamp": "2023-01-16T06:00:00.000001Z",
            "record-type": "control",
            "schema-name": "testdb",
            "table-name": None,
            "transaction-id": 2,
        },
    }
    df = spark.createDataFrame(
        [(json.dumps(envelope),), (json.dumps(control),)], "value string"
    )
    good, dead = transform(df, DB, None)
    assert good.count() == 0
    got = dead.collect()
    assert len(got) == 1
    assert got[0]["error_type"] == "transform-unroutable"
    # fixed destination: the same record routes to the constant table
    good_fixed, dead_fixed = transform(df, DB, TBL)
    assert good_fixed.count() == 1
    assert dead_fixed.count() == 0


def test_split_schema_drift_gate(spark):
    """split_schema_drift: payloads with keys beyond the destination
    schema split to the drifted side in one json_object_keys pass;
    clean payloads (including ones MISSING schema columns — narrowing
    is not drift) stay clean."""
    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_transform import (
        split_schema_drift,
    )

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    good = spark.createDataFrame(
        [
            ('{"id": 1, "name": "a"}',),            # exact
            ('{"id": 2}',),                          # narrower: clean
            ('{"id": 3, "name": "c", "x": 1}',),     # extra key: drift
            ('{"x": 9, "y": 8, "id": 4}',),          # two extras: drift
            ('not json at all',),                    # unparseable: drift
            ('[1, 2, 3]',),                          # non-object: drift
            (None,),                                 # NULL payload: drift
        ],
        "data string",
    )
    clean, drifted = split_schema_drift(good, schema)
    assert sorted(r["data"] for r in clean.collect()) == [
        '{"id": 1, "name": "a"}', '{"id": 2}',
    ]
    # the split is a partition: unparseable/non-object/NULL payloads
    # land in drifted (quarantine-able), never vanish from both sides
    assert drifted.count() == 5
    assert clean.count() + drifted.count() == good.count()


def test_stale_guard_corrupt_timestamp_still_applies(spark, tmp_path):
    """Module contract: a record whose metadata timestamp is unparseable
    (NULL _order_ts) still APPLIES on a stale-guard table — the
    un-guarded NULL gate used to silently drop its update for existing
    keys (review round 10)."""
    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
        apply_batch,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )

    sch = T.StructType([
        T.StructField("trans_id", T.IntegerType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("_order_ts", T.TimestampType()),
        T.StructField("_order_txn", T.LongType()),
    ])
    t = LakeTable.create(str(tmp_path / "t"), sch, keys=["trans_id"])
    base = spark.createDataFrame(
        [(1, 10.0, None, None)], sch
    ).withColumn("_order_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    t.append(base.select(*[f.name for f in sch.fields]))

    typed = spark.createDataFrame(
        [(1, 99.0, None, None, "update")],
        "trans_id int, amount double, _order_ts timestamp, _order_txn bigint, operation string",
    )
    apply_batch(t, typed)
    rows = {r["trans_id"]: r["amount"] for r in t.read(spark).collect()}
    assert rows == {1: 99.0}  # corrupt-ts update applied, not dropped


def test_stale_guard_corrupt_timestamp_replay_blocked_by_txn(spark, tmp_path):
    """A corrupt-ts record is NOT a free pass: when the monotonic txn id
    proves the record older than the target row image, the stale guard
    blocks it — a replayed older batch whose timestamps failed to parse
    must not clobber (or delete) newer data (round-10 advice: the NULL
    gate was fail-open for exactly the records replays produce)."""
    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
        apply_batch,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )

    sch = T.StructType([
        T.StructField("trans_id", T.IntegerType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("_order_ts", T.TimestampType()),
        T.StructField("_order_txn", T.LongType()),
    ])
    t = LakeTable.create(str(tmp_path / "t"), sch, keys=["trans_id"])
    base = spark.createDataFrame([(1, 10.0, None, 7)], sch).withColumn(
        "_order_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    t.append(base.select(*[f.name for f in sch.fields]))

    # replayed batch: unparseable ts (NULL) but txn 3 < target's txn 7
    stale_update = spark.createDataFrame(
        [(1, 99.0, None, 3, "update")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    apply_batch(t, stale_update)
    rows = {r["trans_id"]: r["amount"] for r in t.read(spark).collect()}
    assert rows == {1: 10.0}, "stale corrupt-ts update clobbered newer data"

    # same staleness evidence must also block the delete branch
    stale_delete = spark.createDataFrame(
        [(1, 99.0, None, 3, "delete")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    apply_batch(t, stale_delete)
    assert t.read(spark).count() == 1, "stale corrupt-ts delete removed a newer row"

    # a NEWER corrupt-ts record (txn 9 > 7) still applies (contract)
    fresh = spark.createDataFrame(
        [(1, 55.0, None, 9, "update")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    apply_batch(t, fresh)
    rows = {r["trans_id"]: r["amount"] for r in t.read(spark).collect()}
    assert rows == {1: 55.0}


def _stale_guard_table(spark, tmp_path, target_txn):
    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )

    sch = T.StructType([
        T.StructField("trans_id", T.IntegerType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("_order_ts", T.TimestampType()),
        T.StructField("_order_txn", T.LongType()),
    ])
    t = LakeTable.create(str(tmp_path / "t"), sch, keys=["trans_id"])
    base = spark.createDataFrame([(1, 10.0, None, target_txn)], sch).withColumn(
        "_order_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    t.append(base.select(*[f.name for f in sch.fields]))
    return t


def test_stale_guard_null_txn_is_no_evidence_and_applies(spark, tmp_path):
    """A record whose ts AND txn both failed to parse carries NO
    staleness evidence; when the target row carries a txn id the old
    coalesce(s._order_txn, 0) >= t._order_txn gate silently dropped it
    (0 >= 7 is false) — round-11 advice: absence of a txn id is not
    proof of staleness, and the module contract says corrupt-timestamp
    records still APPLY (absent a dead-letter route)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
        apply_batch,
    )

    t = _stale_guard_table(spark, tmp_path, target_txn=7)
    no_evidence = spark.createDataFrame(
        [(1, 99.0, None, None, "update")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    apply_batch(t, no_evidence)
    rows = {r["trans_id"]: r["amount"] for r in t.read(spark).collect()}
    assert rows == {1: 99.0}, "no-evidence corrupt record silently dropped"


def test_stale_guard_no_evidence_routes_to_dead_letter(spark, tmp_path):
    """With a dead-letter table wired, a no-evidence record (both
    _order_ts and _order_txn NULL) lands there instead of being applied
    on a guess — the reference's S3 error-prefix move
    (firehose_to_iceberg.py:97). Records with ANY ordering evidence
    still go through the gated MERGE, not the dead-letter table."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
        apply_batch,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (
        DEAD_LETTER,
    )

    t = _stale_guard_table(spark, tmp_path, target_txn=7)
    dl = LakeTable.create(str(tmp_path / "dead"), DEAD_LETTER)

    # no-evidence replay: neither applied nor dropped — dead-lettered
    no_evidence = spark.createDataFrame(
        [(1, 99.0, None, None, "update")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    apply_batch(t, no_evidence, dead_letter_table=dl)
    rows = {r["trans_id"]: r["amount"] for r in t.read(spark).collect()}
    assert rows == {1: 10.0}, "no-evidence record applied despite dl route"
    dead = dl.read(spark).collect()
    assert len(dead) == 1
    assert dead[0]["error_type"] == "no-ordering-evidence"
    assert '"trans_id":1' in dead[0]["raw"].replace(" ", "")

    # evidence-bearing corrupt-ts records keep the MERGE path: stale txn
    # blocked by the gate, fresh txn applied — dl stays at one row
    stale = spark.createDataFrame(
        [(1, 88.0, None, 3, "update")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    apply_batch(t, stale, dead_letter_table=dl)
    fresh = spark.createDataFrame(
        [(1, 55.0, None, 9, "update")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    apply_batch(t, fresh, dead_letter_table=dl)
    rows = {r["trans_id"]: r["amount"] for r in t.read(spark).collect()}
    assert rows == {1: 55.0}
    assert dl.read(spark).count() == 1, "evidence-bearing record dead-lettered"


def test_mor_null_operation_upserts_like_cow(spark, tmp_path):
    """A NULL-operation row on a merge-on-read table upserts exactly
    like on a copy-on-write table — it used to fall through BOTH the
    == 'delete' and != 'delete' filters and vanish (review round 10)."""
    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
        apply_batch,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )

    sch = T.StructType([
        T.StructField("trans_id", T.IntegerType()),
        T.StructField("amount", T.DoubleType()),
    ])
    outs = {}
    for mode in ("copy-on-write", "merge-on-read"):
        t = LakeTable.create(
            str(tmp_path / mode), sch, keys=["trans_id"],
            properties={"write.delete.mode": mode},
        )
        typed = spark.createDataFrame(
            [(1, 5.0, "2024-01-01 00:00:00", 1, None),
             (2, 6.0, "2024-01-01 00:00:00", 2, "delete")],
            "trans_id int, amount double, ts string, _order_txn bigint, operation string",
        ).select(
            "trans_id", "amount",
            F.to_timestamp("ts").alias("_order_ts"), "_order_txn", "operation",
        )
        apply_batch(t, typed)
        outs[mode] = sorted(
            (r["trans_id"], r["amount"]) for r in t.read(spark).collect()
        )
    assert outs["copy-on-write"] == outs["merge-on-read"] == [(1, 5.0)]


def test_collapse_ties_deterministic_across_replays(spark):
    """Two ops for one key sharing (_order_ts, _order_txn) — one
    transaction stamping several ops identically — collapse to the SAME
    winner on every evaluation (content-hash tiebreak): idempotent
    replay needs determinism (review round 10)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
        collapse_latest_per_key,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "2024-01-01 00:00:00", 7), (1, 20.0, "2024-01-01 00:00:00", 7)],
        "trans_id int, amount double, ts string, _order_txn bigint",
    ).select(
        "trans_id", "amount",
        F.to_timestamp("ts").alias("_order_ts"), "_order_txn",
    )
    winners = {
        collapse_latest_per_key(
            df.repartition(n), ["trans_id"]
        ).collect()[0]["amount"]
        for n in (1, 2, 3, 4)
    }
    assert len(winners) == 1  # same winner regardless of physical layout


def test_quarantine_drifted_shapes_for_dead_letter(spark, tmp_path):
    """quarantine_drifted turns split_schema_drift's drifted rows into
    the dead-letter shape (raw + error_type schema-drift + time
    partitions) — passing drifted straight to to_dead_letter raised
    UNRESOLVED_COLUMN (review round 10)."""
    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_transform import (
        quarantine_drifted,
        split_schema_drift,
    )

    schema = T.StructType([T.StructField("id", T.LongType())])
    good = spark.createDataFrame(
        [('{"id": 1, "x": 2}', "insert")], "data string, operation string"
    )
    _clean, drifted = split_schema_drift(good, schema)
    dl = quarantine_drifted(drifted).collect()
    assert len(dl) == 1
    assert dl[0]["error_type"] == "schema-drift"
    import json as _json

    rec = _json.loads(dl[0]["raw"])
    assert _json.loads(rec["data"]) == {"id": 1, "x": 2}  # replayable
    assert set(dl[0].asDict()) == {"raw", "error_type", "year", "month", "day", "hour"}


def test_decode_base64_invalid_line_survives_with_original(spark):
    """An invalid-base64 transport line must neither crash the batch
    (unbase64 threw IllegalArgumentException inside codegen) nor lose
    the original payload — it passes through intact and dead-letters
    downstream with raw recoverable (review round 10)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_transform import (
        decode_base64,
        transform,
    )

    df = spark.createDataFrame(
        [("!!!not base64 at all!!!",), ("eyJub3QiOiAiY2RjIn0=",)],
        "value string",
    )
    decoded = decode_base64(df)
    vals = sorted(r["value"] for r in decoded.collect())
    assert vals == ['!!!not base64 at all!!!', '{"not": "cdc"}']
    good, dead = transform(decoded, "db", "tbl")
    assert good.count() == 0
    raws = {r["raw"] for r in dead.collect()}
    assert "!!!not base64 at all!!!" in raws  # original preserved


def test_point_in_time_asof_all_directions_over_history(spark, tmp_path):
    """D5 reference-fidelity follow-through (round-10 verdict item 6):
    the version-stamped change history of a lake table cross-checked by
    as-of joins in ALL THREE directions — backward agrees with the
    TIMESTAMP AS OF snapshot read; forward answers 'next change at or
    after'; nearest picks the closer commit with asymmetric query
    points (25% / 75% between two commits) making the expected side
    unambiguous."""
    import datetime as _dt

    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.asof import (
        asof_join,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )

    t = LakeTable.create(
        str(tmp_path / "bal"),
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("cents", T.LongType()),
        ]),
        keys=["k"],
    )
    t.append(spark.createDataFrame([(1, 100)], "k long, cents long"))
    ts1 = _dt.datetime.fromisoformat(t.manifest()["created"]).replace(tzinfo=None)
    t.update_where(spark, "k = 1", {"cents": "200"})
    ts2 = _dt.datetime.fromisoformat(t.manifest()["created"]).replace(tzinfo=None)
    t.update_where(spark, "k = 1", {"cents": "300"})
    ts3 = _dt.datetime.fromisoformat(t.manifest()["created"]).replace(tzinfo=None)

    hist = spark.createDataFrame(
        [(1, ts1, 100), (1, ts2, 200), (1, ts3, 300)],
        "k long, commit_ts timestamp, bal long",
    )
    d = ts2 - ts1
    assert d.total_seconds() > 0
    q_before = ts1 - _dt.timedelta(seconds=1)
    q_q1 = ts1 + d / 4          # nearer ts1
    q_q3 = ts1 + 3 * d / 4      # nearer ts2
    q_after = ts3 + _dt.timedelta(seconds=1)
    queries = spark.createDataFrame(
        [(1, "before", q_before), (1, "q1", q_q1),
         (1, "q3", q_q3), (1, "after", q_after)],
        "k long, label string, q_ts timestamp",
    )

    def _asof(direction):
        out = asof_join(
            queries, hist, on=["k"], left_ts="q_ts", right_ts="commit_ts",
            value_cols=["bal"], direction=direction,
        )
        return {r["label"]: r["asof_bal"] for r in out.collect()}

    assert _asof("backward") == {
        "before": None, "q1": 100, "q3": 100, "after": 300
    }
    assert _asof("forward") == {
        "before": 100, "q1": 200, "q3": 200, "after": None
    }
    assert _asof("nearest") == {
        "before": 100, "q1": 100, "q3": 200, "after": 300
    }

    # backward as-of MUST agree with the engine's own TIMESTAMP AS OF
    # read at every query point where a snapshot exists
    for q, want in ((q_q1, 100), (q_q3, 100), (q_after, 300)):
        got = t.read(spark, timestamp=q.isoformat()).collect()[0]["cents"]
        assert got == want, "snapshot read diverges from backward as-of"


def test_stale_guard_null_target_ts_still_txn_gated(spark, tmp_path):
    """A target row whose OWN timestamp is corrupt (NULL _order_ts) is
    still protected by the txn gate: the old bare `t._order_ts IS NULL`
    disjunct let an older corrupt-ts record (txn 3) clobber a newer
    corrupt-ts row image (txn 7) — review round 12."""
    from pyspark.sql import types as T

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
        apply_batch,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )

    sch = T.StructType([
        T.StructField("trans_id", T.IntegerType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("_order_ts", T.TimestampType()),
        T.StructField("_order_txn", T.LongType()),
    ])
    t = LakeTable.create(str(tmp_path / "t"), sch, keys=["trans_id"])
    t.append(spark.createDataFrame([(1, 10.0, None, 7)], sch))  # NULL ts

    stale = spark.createDataFrame(
        [(1, 99.0, None, 3, "update")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    apply_batch(t, stale)
    assert {r["amount"] for r in t.read(spark).collect()} == {10.0}, (
        "older corrupt-ts record clobbered a newer corrupt-ts row image"
    )

    fresh = spark.createDataFrame(
        [(1, 55.0, None, 9, "update")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    apply_batch(t, fresh)
    assert {r["amount"] for r in t.read(spark).collect()} == {55.0}


def test_no_evidence_dl_stamp_bounds_replay_duplicates(spark, tmp_path):
    """With a dl_stamp, a replayed batch's no-evidence rows are skipped
    by the dead-letter watermark — without it every crash-restart cycle
    re-appended them (review round 12)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.cdc_apply import (
        apply_batch,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (
        DEAD_LETTER,
    )

    t = _stale_guard_table(spark, tmp_path, target_txn=7)
    dl = LakeTable.create(str(tmp_path / "dead"), DEAD_LETTER)
    no_evidence = spark.createDataFrame(
        [(1, 99.0, None, None, "update")],
        "trans_id int, amount double, _order_ts timestamp, "
        "_order_txn bigint, operation string",
    )
    stamp = ("default@pipe#noev", 5)
    apply_batch(t, no_evidence, dead_letter_table=dl, dl_stamp=stamp)
    apply_batch(t, no_evidence, dead_letter_table=dl, dl_stamp=stamp)  # replay
    assert dl.read(spark).count() == 1, "replayed no-evidence rows duplicated"
    # a LATER batch's rows still land
    apply_batch(
        t, no_evidence, dead_letter_table=dl, dl_stamp=("default@pipe#noev", 6)
    )
    assert dl.read(spark).count() == 2


def test_shared_dl_table_scopes_by_physical_table_identity(spark, tmp_path):
    """Two pipelines feeding DIFFERENT tables but constructed with the
    same copy-pasted ('db', 'tbl') annotation strings must keep
    independent dead-letter watermarks — the string-keyed scope made the
    second pipeline's dl appends vanish below the first's watermark
    (review round 12)."""
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (
        DEAD_LETTER,
        RETAIL_TRANS,
        RETAIL_TRANS_KEYS,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.streaming import (
        CdcStreamPipeline,
    )

    t1 = LakeTable.create(str(tmp_path / "t1"), RETAIL_TRANS, keys=RETAIL_TRANS_KEYS)
    t2 = LakeTable.create(str(tmp_path / "t2"), RETAIL_TRANS, keys=RETAIL_TRANS_KEYS)
    dl = LakeTable.create(str(tmp_path / "dead"), DEAD_LETTER)
    p1 = CdcStreamPipeline(t1, "db", "tbl", dead_letter_table=dl)
    p2 = CdcStreamPipeline(t2, "db", "tbl", dead_letter_table=dl)
    assert p1._dl_app_id != p2._dl_app_id, (
        "shared-dl watermark keys collide across different tables"
    )

    garbage = spark.createDataFrame([("not json",)], "value string")
    p1.process_batch(garbage, 9)  # stamps p1's dl watermark at batch 9
    assert dl.read(spark).count() == 1
    p2.process_batch(garbage, 0)  # p2's batch 0 must NOT be skipped
    assert dl.read(spark).count() == 2, (
        "second pipeline's dl append vanished below the first's watermark"
    )
