"""Named refs (tags/branches), rollback, and write-audit-publish —
Iceberg SnapshotRef parity over the LakeTable snapshot DAG (reference
contract: Iceberg table_type, README.md:292-309)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import LakeTable
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.lake_table import (
    CommitConflict,
    SnapshotNotFound,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.maintenance import (
    expire_snapshots,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ]
)


def _mk(spark, path, rows=((1, "a"), (2, "b"))):
    t = LakeTable.create(str(path), SCHEMA, keys=["id"])
    t.append(spark.createDataFrame(list(rows), SCHEMA))
    return t


# ---------------------------------------------------------------- rollback
def test_rollback_restores_old_state_and_forks_lineage(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    t.append(spark.createDataFrame([(3, "c")], SCHEMA))  # v2
    assert t.row_count() == 3

    assert t.rollback_to(1) == 1
    assert t.current_version() == 1
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    # rolled-back snapshot stays time-travel readable until expiry
    assert t.read(spark, version=2).count() == 3

    # next commit parents off v1 and mints a FRESH number (v3, not v2)
    t.append(spark.createDataFrame([(9, "z")], SCHEMA))
    assert t.current_version() == 3
    assert t.manifest()["parent"] == 1
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 9]


def test_rollback_to_non_ancestor_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    t.append(spark.createDataFrame([(3, "c")], SCHEMA))  # v2
    t.rollback_to(1)
    # v2 exists but is no longer on the current lineage
    with pytest.raises(SnapshotNotFound):
        t.rollback_to(2)
    with pytest.raises(SnapshotNotFound):
        t.rollback_to(99)


def test_changelog_walks_parent_chain_not_version_range(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    t.append(spark.createDataFrame([(3, "c")], SCHEMA))  # v2
    t.rollback_to(1)
    t.append(spark.createDataFrame([(4, "d")], SCHEMA))  # v3, parent=1
    log = t.changelog(spark, 0).collect()
    # v2's orphaned insert (id=3) must NOT appear: lineage is 0->1->3
    assert sorted(r.id for r in log) == [1, 2, 4]
    assert all(r._change_type == "INSERT" for r in log)
    with pytest.raises(SnapshotNotFound):
        t.changelog(spark, 2)  # v2 is not an ancestor of current


# ---------------------------------------------------------------- tags
def test_tag_pins_version_and_is_immutable(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    t.create_tag("audited")  # at current=v1
    t.append(spark.createDataFrame([(3, "c")], SCHEMA))  # v2

    assert t.resolve_ref("audited") == 1
    assert t.read(spark, ref="audited").count() == 2
    assert t.read(spark).count() == 3
    with pytest.raises(CommitConflict):
        t.create_tag("audited", 2)
    with pytest.raises(ValueError):
        t.branch("audited")  # tags are not writable
    t.drop_ref("audited")
    with pytest.raises(SnapshotNotFound):
        t.resolve_ref("audited")


# ---------------------------------------------------------------- WAP
def test_branch_stages_writes_fast_forward_publishes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    t.create_branch("audit")
    b = t.branch("audit")
    b.append(spark.createDataFrame([(3, "c"), (4, "d")], SCHEMA))  # v2 on branch

    # staged rows invisible on main: readers see v1 until publish
    assert t.current_version() == 1
    assert t.read(spark).count() == 2
    assert b.read(spark).count() == 4
    assert t.read(spark, ref="audit").count() == 4

    published = t.fast_forward("audit")
    assert published == t.current_version() == 2
    assert t.read(spark).count() == 4


def test_fast_forward_refuses_diverged_branch(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    t.create_branch("audit")
    b = t.branch("audit")
    b.append(spark.createDataFrame([(3, "c")], SCHEMA))  # branch head v2
    t.append(spark.createDataFrame([(5, "e")], SCHEMA))  # main moves to v3
    with pytest.raises(CommitConflict):
        t.fast_forward("audit")
    # branch itself is intact and still readable
    assert t.read(spark, ref="audit").count() == 3


def test_branch_dml_does_not_touch_main(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    t.create_branch("fix")
    b = t.branch("fix")
    b.delete_where(spark, "id = 1")
    b.update_where(spark, "id = 2", {"v": "'patched'"})
    assert t.read(spark).count() == 2  # main untouched
    rows = {(r.id, r.v) for r in b.read(spark).collect()}
    assert rows == {(2, "patched")}
    t.fast_forward("fix")
    assert {(r.id, r.v) for r in t.read(spark).collect()} == {(2, "patched")}


# ---------------------------------------------------------------- metadata tables
def test_metadata_tables_reflect_dag_and_deletes(spark, tmp_path):
    """snapshots = all heads; history = current ancestry only; refs carry
    pinned row counts; files shows position-deletes under merge-on-read."""
    t = _mk(spark, tmp_path / "t")  # v1
    t.append(spark.createDataFrame([(3, "c")], SCHEMA))  # v2
    t.create_tag("pin", 1)
    t.rollback_to(1)
    t.append(spark.createDataFrame([(4, "d")], SCHEMA))  # v3, parent=1

    snaps = {r.version: r.operation for r in t.meta_snapshots(spark).collect()}
    assert set(snaps) == {0, 1, 2, 3}  # rolled-back v2 still listed
    hist = [r.version for r in t.meta_history(spark).collect()]
    assert hist == [0, 1, 3]  # ancestry only, root first
    refs = {r.name: (r.type, r.version, r.total_rows) for r in t.meta_refs(spark).collect()}
    assert refs == {"pin": ("tag", 1, 2)}

    t.delete_by_keys_mor(spark, spark.createDataFrame([(1,)], "id int"))
    files = t.meta_files(spark).collect()
    contents = {r.content for r in files}
    assert contents == {"data", "position-deletes"}
    data_rows = sum(r.rows for r in files if r.content == "data")
    del_rows = sum(r.rows for r in files if r.content == "position-deletes")
    assert data_rows - del_rows == t.row_count() == 2
    # manifest stats surfaced per file
    assert all(r.stats.get("id") for r in files if r.content == "data")


# ---------------------------------------------------------------- TIMESTAMP AS OF
def test_timestamp_as_of_reads_newest_at_or_before(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    ts_v1 = t.manifest()["created"]
    t.append(spark.createDataFrame([(3, "c")], SCHEMA))  # v2
    ts_v2 = t.manifest()["created"]

    assert t.version_as_of_timestamp(ts_v1) == 1
    assert t.read(spark, timestamp=ts_v1).count() == 2
    assert t.read(spark, timestamp=ts_v2).count() == 3
    assert t.read(spark, timestamp="9999-12-31T00:00:00+00:00").count() == 3
    with pytest.raises(SnapshotNotFound):
        t.version_as_of_timestamp("1970-01-01T00:00:00+00:00")
    with pytest.raises(ValueError):
        t.read(spark, version=1, timestamp=ts_v1)
    # rolled-back heads are invisible to timestamp resolution
    t.rollback_to(1)
    assert t.version_as_of_timestamp(ts_v2) == 1


# ---------------------------------------------------------------- expiry
def test_expiry_protects_tags_branches_and_rolled_back_current(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")  # v1
    t.create_tag("keepme")  # pins v1
    t.create_branch("wip")  # at v1
    b = t.branch("wip")
    b.append(spark.createDataFrame([(7, "g")], SCHEMA))  # v2 branch head
    for i in range(3, 7):
        t.append(spark.createDataFrame([(i, "x")], SCHEMA))  # v3..v6 on main
    t.rollback_to(1)  # current now OLDER than newest snapshots

    stats = expire_snapshots(t, keep_last=1)
    assert stats["removed_snapshots"] > 0
    # pinned survivors: tag v1 (== current after rollback), branch head v2
    assert t.read(spark, ref="keepme").count() == 2
    assert t.read(spark, ref="wip").count() == 3
    assert t.read(spark).count() == 2


def test_cherry_pick_publishes_diverged_branch_commit(spark, tmp_path):
    """WAP with a moved base: fast_forward refuses the diverged branch,
    cherry_pick re-applies just the audited commit's delta onto head."""
    import pytest as _pytest

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.lake_table import (
        CommitConflict,
        LakeTable,
    )
    from pyspark.sql import types as T

    t = LakeTable.create(
        str(tmp_path / "t"),
        T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]),
        keys=["k"],
    )
    t.append(spark.sql("SELECT CAST(1 AS LONG) k, 'base' v"))          # v1
    t.create_branch("audit")
    b = t.branch("audit")
    b.append(spark.sql("SELECT CAST(2 AS LONG) k, 'staged' v"))        # v2 (branch)
    staged_v = b.current_version()
    t.append(spark.sql("SELECT CAST(3 AS LONG) k, 'mainline' v"))      # v3 (main)
    with _pytest.raises(CommitConflict, match="fast-forward"):
        t.fast_forward("audit")
    new_v = t.cherry_pick(staged_v)
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(1, "base"), (2, "staged"), (3, "mainline")]
    assert t.manifest()["summary"]["cherry_picked_version"] == staged_v
    # picking the same commit twice is refused, not silently duplicated
    with _pytest.raises(CommitConflict, match="already present"):
        t.cherry_pick(staged_v)
    # a commit that removed files no longer live at head is refused
    b2 = t.branch("audit")
    b2.delete_where(spark, "k = 1")                                    # removes v1's file
    del_v = b2.current_version()
    t.delete_where(spark, "k = 1")  # head rewrites that file first
    with _pytest.raises(CommitConflict, match="no longer live"):
        t.cherry_pick(del_v)
    assert t.current_version() != new_v  # head advanced by the delete only


def test_orphan_sweep_spares_sink_staging(spark, tmp_path):
    """Expiry's orphan sweep must not delete a Python Data Source
    sink's in-flight staging files (not yet manifested by design)."""
    import os

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.lake_table import (
        LakeTable,
    )
    from pyspark.sql import types as T

    t = LakeTable.create(
        str(tmp_path / "t"),
        T.StructType([T.StructField("k", T.LongType())]), keys=["k"],
    )
    t.append(spark.range(3).selectExpr("id AS k"))
    staging = os.path.join(t.root, "data", "_staging-stream")
    os.makedirs(staging)
    staged = os.path.join(staging, "part-infl.parquet")
    with open(staged, "wb") as f:
        f.write(b"PAR1")  # placeholder bytes; only existence matters
    # a genuine orphan for contrast
    orphan = os.path.join(t.root, "data", "orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"PAR1")
    summary = expire_snapshots(t, keep_last=10)
    assert os.path.exists(staged), "in-flight staging file was swept"
    assert not os.path.exists(orphan), "true orphan survived the sweep"
    # at least the planted orphan (empty unmanifested part files from
    # the append may legitimately add to the count)
    assert summary["removed_orphans"] >= 1


def test_cherry_pick_refuses_equality_delete_commits(spark, tmp_path):
    """Equality deletes re-sequenced onto a moved head would delete
    rows inserted after the divergence (write skew) — refused."""
    import pytest as _pytest

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.lake_table import (
        CommitConflict,
        LakeTable,
    )
    from pyspark.sql import types as T

    t = LakeTable.create(
        str(tmp_path / "t"),
        T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]),
        keys=["k"],
    )
    t.append(spark.sql("SELECT CAST(1 AS LONG) k, 'base' v"))
    t.create_branch("audit")
    b = t.branch("audit")
    b.delete_eq([{"k": 1}])
    eq_v = b.current_version()
    t.append(spark.sql("SELECT CAST(2 AS LONG) k, 'mainline' v"))
    with _pytest.raises(CommitConflict, match="equality-delete"):
        t.cherry_pick(eq_v)


def test_cherry_pick_refuses_branch_rewrites_on_lineage_tables(spark, tmp_path):
    """A file REWRITTEN on a branch carries physically-materialized
    _row_id values drawn from the BRANCH counter; publishing it onto a
    moved head could duplicate ids the head allocated after the
    divergence. The guard raises instead of relying on a docstring
    caveat (r6 ADVICE). Plain branch appends still cherry-pick fine."""
    import pytest as _pytest

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.lake_table import (
        CommitConflict,
        LakeTable,
    )
    from pyspark.sql import types as T

    t = LakeTable.create(
        str(tmp_path / "t"),
        T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]),
        keys=["k"], properties={"row-lineage": "true"},
    )
    # both base rows in ONE file so a branch delete of k=0 must REWRITE
    # the file (materializing _row_id for the survivor) rather than
    # drop it whole
    t.append(
        spark.sql("SELECT CAST(id AS LONG) k, 'base' v FROM range(2)").coalesce(1)
    )
    t.create_branch("audit")

    # append-shaped branch commit publishes fine (ids re-drawn at head)
    b = t.branch("audit")
    b.append(spark.sql("SELECT CAST(10 AS LONG) k, 'staged' v"))
    staged_v = b.current_version()
    t.append(spark.sql("SELECT CAST(20 AS LONG) k, 'mainline' v"))
    t.cherry_pick(staged_v)
    ids = [r["_row_id"] for r in t.read(spark, with_row_ids=True).collect()]
    assert len(ids) == len(set(ids)) == 4  # no duplicate lineage ids

    # rewrite-shaped branch commit (COW delete materializes _row_id in
    # the surviving rows' rewritten file) is refused
    t.create_branch("audit2")
    b2 = t.branch("audit2")
    b2.delete_where(spark, "k = 0")
    rewrite_v = b2.current_version()
    t.append(spark.sql("SELECT CAST(30 AS LONG) k, 'mainline2' v"))
    with _pytest.raises(CommitConflict, match="_row_id"):
        t.cherry_pick(rewrite_v)
