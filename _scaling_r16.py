"""Ad-hoc r16 scaling rehearsal: the 6 newly-declared r16 specs
(-> r16_scaling_declared.jsonl) and the 24 still-staged r17-r20 specs
(-> r16_scaling_staged.jsonl) at sf0.001 and sf0.1, best-of-2 after one
warm-up, same methodology as the r15 records (bench.py tmpfs scratch,
block release between runs)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")

from bench import (  # noqa: E402
    _persistent_ids,
    _prewarm_fixture_cache,
    _release_query_blocks,
    _setup_tmpfs_scratch,
    contention_sentinel,
)

scratch = _setup_tmpfs_scratch()
print(f"# scratch: {scratch}", file=sys.stderr)

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import get_spark  # noqa: E402
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import QUERY_SPECS  # noqa: E402
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries.extended import (  # noqa: E402
    _DECLARE_R16,
    SPECS_NEXT,
)

spark = get_spark(app_name="scaling_r16", master="local[32]", shuffle_partitions=32)
print(f"# sentinel: {contention_sentinel(spark)}", file=sys.stderr)

DECLARED = [QUERY_SPECS[n] for n in (
    "dedup_semantic_cluster_audit", "sample_stratified_proportional",
    "pack_greedy_firstfit_bins", "events_bot_rate_flags",
    "similarity_ivf_recall_audit", "text_novelty_first_seen_ratio",
)]
assert {s.name for s in DECLARED} == _DECLARE_R16
STAGED = list(SPECS_NEXT)


def measure(specs, out_path):
    rows = []
    for sf_dir, sf in (("/root/testdata/sf0.001", 0.001), ("/root/testdata/sf0.1", 0.1)):
        print(f"# prewarm {sf_dir}: {_prewarm_fixture_cache(sf_dir)}", file=sys.stderr)
        row = {"sf": sf}
        for spec in specs:
            pids0 = _persistent_ids(spark)
            try:
                spec.run_spark(spark, sf_dir).count()  # warm-up
                _release_query_blocks(spark, pids0)
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    n = spec.run_spark(spark, sf_dir).count()
                    dt = time.perf_counter() - t0
                    best = dt if best is None or dt < best else best
                    _release_query_blocks(spark, pids0)
                row[spec.name] = round(best, 3)
                print(f"# sf{sf} {spec.name}: {row[spec.name]:.3f}s ({n} rows)",
                      file=sys.stderr)
            except Exception as exc:
                print(f"# sf{sf} {spec.name}: FAILED {type(exc).__name__}: {exc}",
                      file=sys.stderr)
            finally:
                _release_query_blocks(spark, pids0)
        rows.append(row)
    cls = {}
    for name in rows[0]:
        if name == "sf":
            continue
        if name not in rows[1]:
            continue
        r = round(rows[1][name] / max(rows[0][name], 1e-9), 2)
        cls[name] = {
            "x100_wall_ratio": r,
            "class": "flat" if r < 3 else ("sublinear" if r < 30 else "LINEAR-OR-WORSE"),
        }
    with open(out_path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
        f.write(json.dumps({"classification": cls}) + "\n")
    print(f"# wrote {out_path}", file=sys.stderr)
    bad = [n for n, c in cls.items() if c["class"] == "LINEAR-OR-WORSE"]
    print(f"# linear-or-worse: {bad}", file=sys.stderr)


measure(DECLARED, "/root/repo/bench_records/r16_scaling_declared.jsonl")
measure(STAGED, "/root/repo/bench_records/r16_scaling_staged.jsonl")
