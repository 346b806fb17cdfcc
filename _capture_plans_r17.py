"""Capture .explain('formatted') for the round-17 optimization targets.

Usage: python _capture_plans_r17.py before|after [name ...]
Writes plans/r17/<name>_<tag>.txt for each spec (default: the full
target list below). The build itself may run jobs (table-backed specs);
only the final DataFrame's formatted plan is recorded.
"""
import io
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TARGETS = [
    "orders_market_basket_pairs",
    "multimodal_phash_hamming_pairs",
    "dedup_minhash_lsh_pairs",
    "scd2_dimension_history",
    "text_bm25_rank",
    "partition_evolution_lifecycle",
    "incremental_mv_maintenance",
    "cdc_routed_fanout",
    "streaming_interval_join",
    "dedup_cluster_components",
    "pipeline_curate_corpus",
    "similarity_topk_cosine",
    "dedup_semantic_cluster_audit",
    "changelog_incremental_read",
    "maintenance_zorder_cluster",
    "text_novelty_first_seen_ratio",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or TARGETS
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import (
        QUERY_SPECS,
    )
    from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import (
        get_spark,
    )

    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark(
        app_name=f"plans-r17-{tag}", master="local[8]", shuffle_partitions=32
    )
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = QUERY_SPECS.get(name)
        if spec is None:
            print(f"{name}: MISSING", flush=True)
            continue
        try:
            df = spec.run_spark(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            n_ex = buf.getvalue().count("Exchange")
            print(f"{name}: ok ({n_ex} Exchange mentions)", flush=True)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", flush=True)


if __name__ == "__main__":
    main()
