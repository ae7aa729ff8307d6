"""Scaling probe: run a CPU-heavy scan over a (multi-row-group) parquet
file at a given core count and print min-of-K seconds as one JSON line.

Used by tests/test_scaling.py to turn the "spread()/plan fences are no-ops
at scale, parallel when splits exist" claim into a measured invariant —
the bench fixtures are single-row-group files (unsplittable), so this
probe writes its own splittable input and proves the engine's scan path
actually parallelizes when the storage allows it (round-9 VERDICT item 6).

Usage: python tools/scaling_probe.py CPUS PARQUET_PATH [K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    cpus, path = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from clickhouse_23_3_19_32_lts_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-probe-{cpus}",
        extra_confs={
            # split the multi-row-group file into many scan tasks; the
            # probe file is a few MB so the default 128m would yield 1 task
            "spark.sql.files.maxPartitionBytes": str(256 * 1024),
            "spark.sql.files.openCostInBytes": "0",
            "spark.driver.memory": "4g",
        },
    )
    # CPU-heavy per-row work (chained cryptographic hashes — what the
    # pipeline's sketch operators look like), trivial output
    df = spark.read.parquet(path).selectExpr(
        "sum(length(sha2(md5(concat(pay, 'x')), 512))) as s"
    )
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    n_parts = spark.read.parquet(path).rdd.getNumPartitions()
    print(json.dumps({"cpus": int(cpus), "sec": round(best, 4), "scan_tasks": n_parts}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
