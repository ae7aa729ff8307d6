"""Sharded variant of golden_scan.py for parallel rescans.

Usage: python tools/golden_scan_shard.py SHARD NSHARDS out_file
Scans candidates()[SHARD::NSHARDS] — run NSHARDS processes side by side
(each gets its own small SparkSession) and concatenate the outputs.
"""

from __future__ import annotations

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/reference/tests/queries/0_stateless"


class _Timeout(Exception):
    pass


def main() -> None:
    import tempfile

    shard, nshards = int(sys.argv[1]), int(sys.argv[2])
    out_path = sys.argv[3]
    os.chdir(tempfile.mkdtemp(prefix=f"golden_shard{shard}_"))

    os.environ["SPARK_GRAFT_CPUS"] = "8"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    from clickhouse_23_3_19_32_lts_spark.session import get_spark
    from tools.golden import run_golden
    from tools.golden_scan import candidates

    spark = get_spark(app_name=f"golden-shard-{shard}", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    names = candidates()[shard::nshards]
    print(f"shard {shard}/{nshards}: {len(names)} files", flush=True)
    passed = 0
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_Timeout()))
    with open(out_path, "w") as out:
        for i, name in enumerate(names):
            signal.alarm(60)
            try:
                ok, _msg = run_golden(
                    spark, f"{BASE}/{name}.sql", f"{BASE}/{name}.reference"
                )
            except Exception:  # noqa: BLE001 — scan must survive anything
                ok = False
            finally:
                signal.alarm(0)
            if ok:
                passed += 1
                out.write(name + "\n")
                out.flush()
            if (i + 1) % 100 == 0:
                print(f"shard {shard}: {i + 1}/{len(names)}, {passed} pass", flush=True)
    print(f"shard {shard} DONE {passed}/{len(names)}", flush=True)


if __name__ == "__main__":
    main()
