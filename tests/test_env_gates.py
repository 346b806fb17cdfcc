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


def test_get_spark_warns_only_on_actual_conf_mismatch(spark, monkeypatch):
    """The pre-existing-session warning must fire only when the resulting
    session's conf actually differs from the requested creation-time
    settings — it used to fire on EVERY get_spark call after the first
    whenever the env vars were set, even when the active session was
    created with those exact values (round-11 advice)."""
    import warnings

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import (
        get_spark,
    )

    # matching value: no warning (context conf = creation-time truth)
    current_mem = spark.sparkContext.getConf().get("spark.driver.memory", None)
    if current_mem:
        monkeypatch.setenv("SPARK_DRIVER_MEMORY", current_mem)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = get_spark()
        assert got is spark

    # differing value: warns, names the setting
    monkeypatch.setenv("SPARK_DRIVER_MEMORY", "123g")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        get_spark()
    msgs = [str(w.message) for w in rec]
    assert any("spark.driver.memory" in m and "123g" in m for m in msgs), msgs
