"""Sharded variant of golden_scan.py for parallel rescans.

Usage: python tools/golden_scan_shard.py SHARD NSHARDS out_file
Scans candidates()[SHARD::NSHARDS] — run NSHARDS processes side by side
(each gets its own small SparkSession) and concatenate the outputs.

Self-healing: a pathological candidate can kill the local JVM (huge
array/range allocations) or an alarm-timeout can corrupt the py4j socket
mid-read; after every failure the shard health-checks its session and
rebuilds it, so one bad file costs one result, not the rest of the shard.
"""

from __future__ import annotations

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/reference/tests/queries/0_stateless"


class _Timeout(Exception):
    pass


def _fresh_spark(shard: int):
    from pyspark.sql import SparkSession

    from clickhouse_23_3_19_32_lts_spark.session import get_spark

    try:
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
    except Exception:  # noqa: BLE001 — dead JVM; just drop the handle
        pass
    # clear cached singletons so getOrCreate builds a new JVM
    try:
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
        from pyspark import SparkContext

        SparkContext._active_spark_context = None
        SparkContext._gateway = None
        SparkContext._jvm = None
    except Exception:  # noqa: BLE001
        pass
    spark = get_spark(app_name=f"golden-shard-{shard}", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _healthy(spark) -> bool:
    try:
        signal.alarm(20)
        spark.sql("SELECT 1").collect()
        return True
    except Exception:  # noqa: BLE001
        return False
    finally:
        signal.alarm(0)


def main() -> None:
    import tempfile

    shard, nshards = int(sys.argv[1]), int(sys.argv[2])
    out_path = sys.argv[3]
    os.chdir(tempfile.mkdtemp(prefix=f"golden_shard{shard}_"))

    os.environ["SPARK_GRAFT_CPUS"] = "8"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "14g")
    from tools.golden import run_golden
    from tools.golden_scan import candidates

    spark = _fresh_spark(shard)
    names = candidates()[shard::nshards]
    print(f"shard {shard}/{nshards}: {len(names)} files", flush=True)
    import threading

    passed = 0
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_Timeout()))
    with open(out_path, "w") as out:
        for i, name in enumerate(names):
            signal.alarm(90)
            # SIGALRM can't interrupt a JVM-side runaway (the Python thread
            # sits in a py4j recv): a watchdog cancels the Spark jobs so the
            # blocked collect() raises and the alarm path regains control
            sc = spark.sparkContext
            dog = threading.Timer(100.0, lambda: sc.cancelAllJobs())
            dog.daemon = True
            dog.start()
            ok = False
            failed = False
            try:
                ok, _msg = run_golden(
                    spark, f"{BASE}/{name}.sql", f"{BASE}/{name}.reference"
                )
            except Exception:  # noqa: BLE001 — scan must survive anything
                failed = True
            finally:
                signal.alarm(0)
                dog.cancel()
            if ok:
                passed += 1
                out.write(name + "\n")
                out.flush()
            elif failed and not _healthy(spark):
                print(f"shard {shard}: session died at {name}; rebuilding", flush=True)
                spark = _fresh_spark(shard)
            if (i + 1) % 100 == 0:
                print(f"shard {shard}: {i + 1}/{len(names)}, {passed} pass", flush=True)
    print(f"shard {shard} DONE {passed}/{len(names)}", flush=True)


if __name__ == "__main__":
    main()
