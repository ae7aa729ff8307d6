"""Batch first-diff reporter: run a list of reference tests and write
NAME, the statement list, and the first unified-diff hunk (or error) per
test to a report file — input for clustering dialect gaps.

Usage: python tools/golden_firstdiff.py SHARD NSHARDS out_file names.txt
"""

from __future__ import annotations

import difflib
import os
import signal
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/reference/tests/queries/0_stateless"


class _Timeout(Exception):
    pass


def main() -> None:
    shard, nshards = int(sys.argv[1]), int(sys.argv[2])
    out_path, names_path = sys.argv[3], sys.argv[4]
    os.chdir(tempfile.mkdtemp(prefix=f"golden_fd{shard}_"))
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from tools.golden import run_golden
    from tools.golden_scan_shard import _fresh_spark, _healthy

    spark = _fresh_spark(shard)
    spark.sparkContext.setLogLevel("FATAL")
    names = [l.strip() for l in open(names_path) if l.strip()][shard::nshards]
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_Timeout()))
    with open(out_path, "w") as out:
        for i, name in enumerate(names):
            signal.alarm(60)
            sc = spark.sparkContext
            dog = threading.Timer(70.0, lambda: sc.cancelAllJobs())
            dog.daemon = True
            dog.start()
            try:
                ok, msg = run_golden(
                    spark, f"{BASE}/{name}.sql", f"{BASE}/{name}.reference"
                )
            except Exception as exc:  # noqa: BLE001
                ok, msg = False, f"EXC {type(exc).__name__}: {exc}"
            finally:
                signal.alarm(0)
                dog.cancel()
            if not ok and msg.startswith("EXC") and not _healthy(spark):
                print(f"shard {shard}: session died at {name}; rebuilding", flush=True)
                spark = _fresh_spark(shard)
                spark.sparkContext.setLogLevel("FATAL")
            if ok:
                out.write(f"### {name} PASS\n")
                out.flush()
                continue
            msg = msg or ""
            if msg.startswith("mismatch:") and "--got--" in msg and "--want--" in msg:
                got = msg.split("--got--\n", 1)[1].split("\n--want--", 1)[0].split("\n")
                want = msg.split("--want--\n", 1)[1].split("\n")
                diff = list(
                    difflib.unified_diff(want, got, "want", "got", lineterm="", n=0)
                )
                body = "\n".join(diff[2:12])
            else:
                body = msg[:400].replace("\n", " | ")
            out.write(f"### {name} FAIL\n{body}\n")
            out.flush()
            if (i + 1) % 50 == 0:
                print(f"shard {shard}: {i + 1}/{len(names)}", flush=True)
    print(f"shard {shard} DONE", flush=True)


if __name__ == "__main__":
    main()
