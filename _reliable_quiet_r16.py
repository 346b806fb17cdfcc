"""Ad-hoc r16 watch-item closure: quiet-host best-of-5 for
containment_reliable_ckpt (tmpfs checkpoint dir) with its disk control
(ext4 /tmp checkpoint dir) in the same record — the same methodology
that closed the cdc_retail_replay watch item in r15."""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")

from bench import (  # noqa: E402
    _persistent_ids,
    _prewarm_fixture_cache,
    _read_sentinel,
    _release_query_blocks,
    _setup_tmpfs_scratch,
    contention_sentinel,
)

scratch = _setup_tmpfs_scratch()

from transactional_datalake_using_amazon_datafirehose_iceberg_spark.session import get_spark  # noqa: E402
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.queries import QUERY_SPECS  # noqa: E402
from transactional_datalake_using_amazon_datafirehose_iceberg_spark.operators.materialize import (  # noqa: E402
    set_checkpoint_mode,
)

SF_DIR = "/root/testdata/sf0.1"
spark = get_spark(app_name="reliable_quiet_r16", master="local[32]",
                  shuffle_partitions=32)
sentinel = contention_sentinel(spark)
sentinel["read_mb_s"] = _read_sentinel()
print(f"# sentinel: {sentinel}", file=sys.stderr)
print(f"# prewarm: {_prewarm_fixture_cache(SF_DIR)}", file=sys.stderr)

spec = QUERY_SPECS["dedup_containment_asymmetric"]
out = {"spec": "dedup_containment_asymmetric", "sf": 0.1,
       "sentinel": sentinel, "scratch": scratch,
       "context": ("r15 watch item: driver containment_reliable_ckpt 6.489 "
                   "vs r14 4.088 while local records read 3.25-4.13 and the "
                   "same-record disk control read 3.645; target <= ~4.1")}

sc = spark.sparkContext


def best_of_5(label, ckpt_dir=None):
    pids0 = _persistent_ids(spark)
    set_checkpoint_mode("reliable")
    if ckpt_dir is not None:
        sc.setCheckpointDir(ckpt_dir)
    runs = []
    try:
        spec.run_spark(spark, SF_DIR).count()  # warm-up
        _release_query_blocks(spark, pids0)
        for _ in range(5):
            t0 = time.perf_counter()
            n = spec.run_spark(spark, SF_DIR).count()
            runs.append(round(time.perf_counter() - t0, 3))
            _release_query_blocks(spark, pids0)
        out[label] = {"runs": runs, "best": min(runs), "rows": n,
                      "loadavg_1m": round(os.getloadavg()[0], 2)}
        print(f"# {label}: best {min(runs)} of {runs}", file=sys.stderr)
    finally:
        set_checkpoint_mode(None)
        _release_query_blocks(spark, pids0)


# default-mode reference first (the r15 driver also drifted 4.56->4.905
# on dedup_containment_asymmetric itself)
pids0 = _persistent_ids(spark)
spec.run_spark(spark, SF_DIR).count()
_release_query_blocks(spark, pids0)
runs = []
for _ in range(5):
    t0 = time.perf_counter()
    spec.run_spark(spark, SF_DIR).count()
    runs.append(round(time.perf_counter() - t0, 3))
    _release_query_blocks(spark, pids0)
out["default_mode"] = {"runs": runs, "best": min(runs)}
print(f"# default_mode: best {min(runs)} of {runs}", file=sys.stderr)

best_of_5("reliable_tmpfs")
disk_dir = tempfile.mkdtemp(prefix="reliable_quiet_disk_", dir="/tmp")
best_of_5("reliable_disk_control", ckpt_dir=disk_dir)

with open("/root/repo/bench_records/r16_reliable_quiet_host.json", "w") as f:
    json.dump(out, f, indent=1)
print("# wrote bench_records/r16_reliable_quiet_host.json", file=sys.stderr)
