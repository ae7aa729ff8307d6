"""Debug one golden test: print SQL, result diff / error. Keeps a warm
SparkSession across stdin-fed test names for fast iteration.

Usage:
  python tools/golden_dbg.py NAME        # one-shot
  python tools/golden_dbg.py -           # read names from stdin (REPL)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/reference/tests/queries/0_stateless"


def run_one(spark, name: str) -> None:
    sql_path = f"{BASE}/{name}.sql"
    ref_path = f"{BASE}/{name}.reference"
    if not os.path.exists(sql_path):
        print(f"no such test: {name}")
        return
    print("=" * 70)
    print("--- SQL", name)
    print(open(sql_path, errors="replace").read()[:4000])
    # hot-reload the dialect + runner so edits apply without losing the JVM
    import importlib

    import clickhouse_23_3_19_32_lts_spark.chtypes as _cht
    import clickhouse_23_3_19_32_lts_spark.dialect as _dia
    import clickhouse_23_3_19_32_lts_spark.functions.arrays as _fa
    import clickhouse_23_3_19_32_lts_spark.functions.conversion as _fc
    import clickhouse_23_3_19_32_lts_spark.functions.ipfns as _fi
    import clickhouse_23_3_19_32_lts_spark.functions.variants2 as _fv2
    import clickhouse_23_3_19_32_lts_spark.functions.variants3 as _fv3
    import tools.golden as _g

    for _m in (_cht, _fa, _fc, _fi, _fv2, _fv3, _dia, _g):
        importlib.reload(_m)
    from tools.golden import run_golden

    try:
        ok, msg = run_golden(spark, sql_path, ref_path)
    except Exception as exc:  # noqa: BLE001
        print(f"--- EXC: {type(exc).__name__}: {exc}")
        return
    if ok:
        print("--- PASS")
        return
    msg = msg or ""
    if msg.startswith("mismatch:") and "--got--" in msg and "--want--" in msg:
        got = msg.split("--got--\n", 1)[1].split("\n--want--", 1)[0].split("\n")
        want = msg.split("--want--\n", 1)[1].split("\n")
        import difflib

        diff = list(difflib.unified_diff(want, got, "want", "got", lineterm="", n=1))
        print("--- FAIL (first diff hunks)")
        print("\n".join(diff[:40]))
    else:
        print(f"--- FAIL\n{msg[:3000]}")


def main() -> None:
    os.chdir(tempfile.mkdtemp(prefix="golden_dbg_"))
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from clickhouse_23_3_19_32_lts_spark.session import get_spark

    spark = get_spark(app_name="golden-dbg", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("FATAL")
    args = sys.argv[1:]
    if args == ["-"]:
        for line in sys.stdin:
            name = line.strip()
            if name:
                run_one(spark, name)
            print("READY", flush=True)
    else:
        for name in args:
            run_one(spark, name)


if __name__ == "__main__":
    main()
