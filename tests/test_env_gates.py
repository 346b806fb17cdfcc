"""The suite's only two skips must be ENVIRONMENT gates (jar/package
absent in this container), never code gates: the moment the Iceberg
runtime jar or protobuf appears on the classpath, the skipped tests must
run with zero code change (round-4 verdict task 7). This meta-test pins
(a) the gate predicates are live environment probes and (b) the skip
reasons say so."""

from __future__ import annotations

import importlib.util


def test_iceberg_skip_is_environment_conditional(spark):
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans.iceberg_compat import (
        iceberg_available,
    )

    jar_present = False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        jar_present = True
    except Exception:
        pass
    # the gate must agree with the actual classpath probe — if the jar
    # ever lands in this container, iceberg_available flips to True and
    # test_cdc_replay_real_iceberg runs unmodified
    assert iceberg_available(spark) == jar_present

    src = open("tests/test_iceberg_backend.py").read()
    assert "if not iceberg_available(spark):" in src
    assert "jar not on classpath" in src  # reason names the environment


def test_protobuf_skip_is_environment_conditional():
    try:
        importlib.import_module("google.protobuf.descriptor")
        pb_present = True
    except ImportError:
        pb_present = False
    src = open("tests/test_streaming.py").read()
    # gate = a live import probe (importorskip), reason names the package
    assert 'pytest.importorskip(\n        "google.protobuf.descriptor"' in src
    assert "needs protobuf (absent offline)" in src
    # sanity: this container's state matches the skip expectation the
    # round reports assume (2 skips). If protobuf appears, the skipped
    # test runs — and this assertion documents the flip.
    if pb_present:
        import pytest

        pytest.xfail("protobuf now present: the streaming skip should have become a pass")
