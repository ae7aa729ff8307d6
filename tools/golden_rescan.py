"""Re-run a specific list of golden tests (names file) and print passes.

Usage: python tools/golden_rescan.py names.txt [out_file]
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

    names = [ln.strip() for ln in open(sys.argv[1]) if ln.strip()]
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/golden_rescan_pass.txt"
    os.chdir(tempfile.mkdtemp(prefix="golden_rescan_"))

    from clickhouse_23_3_19_32_lts_spark.session import get_spark
    from tools.golden import run_golden

    spark = get_spark(app_name="golden-rescan", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_Timeout()))
    n_pass = 0
    with open(out_path, "w") as out:
        for i, name in enumerate(names):
            signal.alarm(45)
            try:
                ok, _ = run_golden(spark, f"{BASE}/{name}.sql", f"{BASE}/{name}.reference")
            except _Timeout:
                ok = False
            except Exception:  # noqa: BLE001
                ok = False
            finally:
                signal.alarm(0)
            if ok:
                n_pass += 1
                out.write(name + "\n")
                out.flush()
            if (i + 1) % 200 == 0:
                print(f"{i + 1}/{len(names)}: {n_pass} now pass", flush=True)
    print(f"DONE {n_pass}/{len(names)} newly pass -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
