"""Property-based check of snapshot expiry.

Random interleavings of append / COW delete / MOR delete / tag /
rollback / expire must preserve: (a) the current read equals a dict
reference model, (b) every pinned version (current + refs) stays
readable with its recorded content, (c) expired versions raise, and
(d) after expiry + orphan sweep every on-disk parquet is referenced by
a surviving manifest (no leaks, no dangling refs).
"""

from __future__ import annotations

import os

import pytest

# slow assurance lane (round-17): hypothesis expiry interleaving sweep;
# skipped in the default verify lane, run with SPARK_GRAFT_FULL_TESTS=1
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import LakeTable
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.lake_table import (
    SnapshotNotFound,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.maintenance import (
    expire_snapshots,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.IntegerType(), True),
    ]
)

# op = ("append", [(k, v)...]) | ("delete_cow", k) | ("delete_mor", k)
#    | ("tag",) | ("branch",) | ("expire", keep_last)
ops_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(
                st.tuples(st.integers(0, 6), st.integers(0, 99)),
                min_size=1, max_size=3,
            ),
        ),
        st.tuples(st.just("delete_cow"), st.integers(0, 6)),
        st.tuples(st.just("delete_mor"), st.integers(0, 6)),
        st.tuples(st.just("tag")),
        st.tuples(st.just("branch")),
        st.tuples(st.just("rollback")),
        st.tuples(st.just("expire"), st.integers(1, 3)),
    ),
    min_size=3,
    max_size=8,
)


def _disk_parquets(root: str) -> set[str]:
    out = set()
    for dirpath, _dirs, files in os.walk(os.path.join(root, "data")):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.path.relpath(os.path.join(dirpath, f), root))
    return out


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


@given(ops=ops_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_expiry_interleavings_preserve_pinned_state(
    prop_spark, tmp_path_factory, ops
):
    spark = prop_spark
    t = LakeTable.create(
        str(tmp_path_factory.mktemp("exp") / "t"), SCHEMA, keys=["k"]
    )
    model: dict[int, int] = {}
    pinned: dict[str, dict[int, int]] = {}  # ref name -> state snapshot
    expired: set[int] = set()
    n_tags = 0
    n_branches = 0
    for op in ops:
        kind = op[0]
        if kind == "append":
            # upsert semantics via MOR delete of existing + append
            rows = dict(op[1])
            existing = [k for k in rows if k in model]
            if existing:
                t.delete_eq([{"k": k} for k in existing])
            t.append(spark.createDataFrame(list(rows.items()), SCHEMA))
            model.update(rows)
        elif kind == "delete_cow":
            t.delete_where(spark, f"k = {op[1]}")
            model.pop(op[1], None)
        elif kind == "delete_mor":
            t.delete_eq([{"k": op[1]}])
            model.pop(op[1], None)
        elif kind == "tag":
            name = f"tag{n_tags}"
            n_tags += 1
            t.create_tag(name)
            pinned[name] = dict(model)
        elif kind == "branch":
            # a branch head pins its snapshot exactly like a tag until
            # the branch moves; nothing writes through it here, so its
            # recorded state must survive every later expiry
            name = f"br{n_branches}"
            n_branches += 1
            t.create_branch(name)
            pinned[name] = dict(model)
        elif kind == "rollback":
            # roll back to the newest tag when it is still an ancestor
            # of the head; a tag stranded on an abandoned lineage makes
            # rollback_to raise (SnapshotNotFound) and the model stays
            # put. Guard on n_tags, not pinned: branches fill `pinned`
            # too but are never rollback targets here.
            if n_tags:
                name = f"tag{n_tags - 1}"
                try:
                    t.rollback_to(t.resolve_ref(name))
                    model = dict(pinned[name])
                except (ValueError, SnapshotNotFound):
                    pass
        elif kind == "expire":
            live_before = {s["version"] for s in t.snapshots()}
            expire_snapshots(t, keep_last=op[1])
            live_after = {
                int(n[1:13])
                for n in os.listdir(os.path.join(t.root, "_snapshots"))
            }
            expired |= live_before - live_after

    # (a) current read == model
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == model, (got, model)
    # (b) every tag still reads its recorded state
    for name, state in pinned.items():
        tg = {
            r["k"]: r["v"]
            for r in t.read(spark, version=t.resolve_ref(name)).collect()
        }
        assert tg == state, (name, tg, state)
    # (c) expired versions are unreadable
    for v in expired:
        with pytest.raises(Exception):
            t.manifest(v)
    # (d) disk = union of surviving manifests' references (plus nothing)
    refs = {
        p for p in t.referenced_files() if p.endswith(".parquet")
    }
    disk = _disk_parquets(t.root)
    assert refs <= disk, refs - disk  # no dangling manifest refs
    # run expiry once more: its orphan sweep must leave disk == refs
    expire_snapshots(t, keep_last=len(os.listdir(os.path.join(t.root, "_snapshots"))))
    assert _disk_parquets(t.root) == {
        p for p in t.referenced_files() if p.endswith(".parquet")
    }


@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=60, deadline=None)
def test_any_crash_prefix_of_a_manifest_reads_as_torn(tmp_path_factory, cut):
    """_write_manifest crashes can truncate the file at ANY byte. A
    strict prefix of json.dump's output must never parse as a manifest
    (it always starts with '{', so it is incomplete JSON until the last
    byte) — _load_manifest_or_none must return None for every prefix
    and the full dict only at full length. A prefix that slipped
    through would make snapshots()/expiry read a half-commit."""
    import json
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.lake_table import (
        _load_manifest_or_none,
    )

    manifest = {
        "version": 7, "parent": 6, "schema": "{}", "keys": ["id"],
        "cluster_by": [], "properties": {"k": "v"},
        "files": [{"path": "data/x/part-0.parquet", "rows": 10}],
        "delete_files": [],
        "summary": {"operation": "append", "total_rows": 10},
        "created": "2026-08-15T00:00:00+00:00",
    }
    full = json.dumps(manifest)
    n = cut % (len(full) + 1)
    d = tmp_path_factory.mktemp("torn")
    p = str(d / "v000000000007.json")
    with open(p, "w") as f:
        f.write(full[:n])
    got = _load_manifest_or_none(p)
    if n == len(full):
        assert got == manifest
    else:
        assert got is None
