"""Benchmark harness — runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once after a warm-up pass of the catalog
(view registration + file listing), timed wall-clock to completion of a
full materialization (count of the result — results are small aggregate
outputs, so the count forces the whole plan without driver transfer
cost dominating).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import (  # noqa: E402
    QUERY_SPECS,
)
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import (  # noqa: E402
    get_spark,
)

# headline set: one per operator family (joins, aggs, windows, llm-ops)
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q19_disjunctive_predicates",
    "window_topk_per_group",
    "events_sessionize_gap",
    "agg_rollup",
    "join_broadcast_dims",
    "asof_join_purchase_click",
    "higher_order_array_funcs",
    # llm-ops
    "dedup_minhash_lsh_pairs",
    "similarity_topk_cosine",
    "text_stats_quality",
    # full transactional path (transform + collapse + COW MERGE)
    "cdc_retail_replay",
]


def bench_streaming_ingest(spark, trigger_seconds: int = 60, n_records: int = 6000) -> dict:
    """BASELINE.md's one real latency target: a CDC delivery buffer must
    be applied within the trigger interval (reference: 60 s/128 MB
    Firehose buffer, 3-5 min end-to-end visibility, README.md:447). Runs
    the real Structured Streaming pipeline with a processingTime trigger
    over one buffer of demo-rate inserts and reports the non-empty
    batch's triggerExecution wall time from the query progress."""
    import tempfile

    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.plans import (
        LakeTable,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.schemas import (
        DEAD_LETTER,
        RETAIL_TRANS,
        RETAIL_TRANS_KEYS,
        RETAIL_TRANS_PARTITION,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.sources.cdc_jsonl import (
        write_demo_rate_corpus,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.streaming import (
        CdcStreamPipeline,
    )

    d = tempfile.mkdtemp(prefix="bench_stream_")
    in_dir = os.path.join(d, "in")
    write_demo_rate_corpus(os.path.join(in_dir, "buffer0.jsonl"), n_records)
    table = LakeTable.create(
        os.path.join(d, "retail"), RETAIL_TRANS,
        keys=RETAIL_TRANS_KEYS, cluster_by=RETAIL_TRANS_PARTITION,
    )
    dl = LakeTable.create(os.path.join(d, "dead"), DEAD_LETTER)
    pipe = CdcStreamPipeline(table, "db", "tbl", dead_letter_table=dl)
    q = pipe.start(
        spark, in_dir, os.path.join(d, "ckpt"), trigger_seconds=trigger_seconds
    )
    applied = None
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            for p in q.recentProgress:
                if p and p.get("numInputRows", 0) > 0:
                    applied = p
                    break
            if applied:
                break
            time.sleep(0.25)
    finally:
        q.stop()
    if applied is None:
        return {"error": "no non-empty batch within 120s"}
    batch_sec = round(applied["durationMs"]["triggerExecution"] / 1000.0, 3)
    return {
        "records": n_records,
        "rows_applied": table.row_count(),
        "trigger_interval_sec": trigger_seconds,
        "batch_apply_sec": batch_sec,
        "applied_within_interval": batch_sec < trigger_seconds,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )

    sf = sf_dir.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        spec = QUERY_SPECS.get(name)
        if spec is None:
            continue
        try:
            # one untimed warm-up execution per query: amortizes whole-
            # stage-codegen compilation and file listing, so the timed run
            # measures steady-state execution (what repeats at scale)
            spec.run_spark(spark, sf_dir).count()
            t0 = time.perf_counter()
            df = spec.run_spark(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        except Exception as exc:  # one broken query must not lose the run
            print(f"# {name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)

    try:
        streaming = bench_streaming_ingest(spark)
        if "batch_apply_sec" in streaming:
            timings["streaming_ingest"] = streaming["batch_apply_sec"]
        print(f"# streaming_ingest: {streaming}", file=sys.stderr)
    except Exception as exc:
        streaming = {"error": f"{type(exc).__name__}: {exc}"}
        print(f"# streaming_ingest: FAILED {streaming['error']}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "streaming_ingest": streaming,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
