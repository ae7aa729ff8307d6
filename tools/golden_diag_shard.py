"""Sharded diagnostic scan over candidates NOT already in the golden corpus.

Writes TSV name<TAB>status<TAB>detail so dialect work can target the biggest
failure clusters.

Usage: python tools/golden_diag_shard.py SHARD NSHARDS out_file
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

    shard, nshards = int(sys.argv[1]), int(sys.argv[2])
    out_path = sys.argv[3]
    os.chdir(tempfile.mkdtemp(prefix=f"golden_diag{shard}_"))

    os.environ["SPARK_GRAFT_CPUS"] = "8"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    from clickhouse_23_3_19_32_lts_spark.session import get_spark
    from tools.golden import run_golden
    from tools.golden_scan import candidates

    corpus = set()
    with open(os.path.join(REPO, "tests", "golden_corpus.txt")) as f:
        corpus = {ln.strip() for ln in f if ln.strip()}

    spark = get_spark(app_name=f"golden-diag-{shard}", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in candidates() if n not in corpus][shard::nshards]
    print(f"shard {shard}/{nshards}: {len(names)} failing candidates", flush=True)
    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_Timeout()))
    n_pass = 0
    with open(out_path, "w") as out:
        for i, name in enumerate(names):
            signal.alarm(45)
            try:
                ok, msg = run_golden(
                    spark, f"{BASE}/{name}.sql", f"{BASE}/{name}.reference"
                )
            except _Timeout:
                ok, msg = False, "timeout"
            except Exception as ex:  # noqa: BLE001
                ok, msg = False, f"crash: {str(ex).splitlines()[0][:200]}"
            finally:
                signal.alarm(0)
            if ok:
                n_pass += 1
            detail = " | ".join(str(msg).splitlines())[:260]
            out.write(f"{name}\t{'pass' if ok else 'fail'}\t{detail}\n")
            out.flush()
            if (i + 1) % 100 == 0:
                print(f"shard {shard}: {i + 1}/{len(names)}, {n_pass} new-pass", flush=True)
    print(f"shard {shard} DONE {n_pass}/{len(names)} new passes -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
