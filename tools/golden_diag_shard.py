"""Sharded diagnostic scan over candidates NOT already in the golden corpus.

Writes TSV name<TAB>status<TAB>detail so dialect work can target the biggest
failure clusters.

Self-healing: a pathological candidate can kill the local JVM; after every
crash the shard health-checks its session and rebuilds it, so one bad file
costs one result, not the rest of the shard (same protocol as
golden_scan_shard.py).

Usage: python tools/golden_diag_shard.py SHARD NSHARDS out_file [names.txt]
With names.txt, scans that list (sharded) instead of all non-corpus
candidates — used to re-evaluate rows a dead JVM marked "Connection refused".
"""

from __future__ import annotations

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/reference/tests/queries/0_stateless"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _Timeout(Exception):
    pass


def main() -> None:
    import tempfile
    import threading

    shard, nshards = int(sys.argv[1]), int(sys.argv[2])
    out_path = sys.argv[3]
    names_file = sys.argv[4] if len(sys.argv) > 4 else None
    os.chdir(tempfile.mkdtemp(prefix=f"golden_diag{shard}_"))

    os.environ["SPARK_GRAFT_CPUS"] = "8"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    from tools.golden import run_golden
    from tools.golden_scan import candidates
    from tools.golden_scan_shard import _fresh_spark, _healthy

    corpus = set()
    with open(os.path.join(REPO, "tests", "golden_corpus.txt")) as f:
        corpus = {ln.strip() for ln in f if ln.strip()}

    spark = _fresh_spark(shard)
    if names_file:
        pool = [ln.strip() for ln in open(names_file) if ln.strip()]
    else:
        pool = [n for n in candidates() if n not in corpus]
    names = pool[shard::nshards]
    print(f"shard {shard}/{nshards}: {len(names)} failing candidates", flush=True)
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_Timeout()))
    n_pass = 0
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
            crashed = False
            try:
                ok, msg = run_golden(
                    spark, f"{BASE}/{name}.sql", f"{BASE}/{name}.reference"
                )
            except _Timeout:
                ok, msg = False, "timeout"
                crashed = True
            except Exception as ex:  # noqa: BLE001
                ok, msg = False, f"crash: {str(ex).splitlines()[0][:200]}"
                crashed = True
            finally:
                signal.alarm(0)
                dog.cancel()
            if ok:
                n_pass += 1
            detail = " | ".join(str(msg).splitlines())[:260]
            out.write(f"{name}\t{'pass' if ok else 'fail'}\t{detail}\n")
            out.flush()
            if crashed and not _healthy(spark):
                print(f"shard {shard}: session died at {name}; rebuilding", flush=True)
                spark = _fresh_spark(shard)
            if (i + 1) % 100 == 0:
                print(f"shard {shard}: {i + 1}/{len(names)}, {n_pass} new-pass", flush=True)
    print(f"shard {shard} DONE {n_pass}/{len(names)} new passes -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
