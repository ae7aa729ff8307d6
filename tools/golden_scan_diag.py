"""Like golden_scan.py but records WHY each candidate fails, so dialect work
can target the biggest error clusters. Writes TSV: name<TAB>status<TAB>detail.

Usage: python tools/golden_scan_diag.py [out_file]
"""

from __future__ import annotations

import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/reference/tests/queries/0_stateless"


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def main() -> None:
    import tempfile

    os.chdir(tempfile.mkdtemp(prefix="golden_diag_"))

    from clickhouse_23_3_19_32_lts_spark.session import get_spark
    from tools.golden import run_golden
    from tools.golden_scan import candidates

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/golden_diag.tsv"
    spark = get_spark(app_name="golden-diag", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    names = candidates()
    print(f"{len(names)} candidate files", flush=True)
    n_pass = 0
    signal.signal(signal.SIGALRM, _alarm)
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
                ok, msg = False, f"crash: {str(ex).splitlines()[0][:160]}"
            finally:
                signal.alarm(0)
            if ok:
                n_pass += 1
            detail = " | ".join(msg.splitlines())[:240]
            out.write(f"{name}\t{'pass' if ok else 'fail'}\t{detail}\n")
            out.flush()
            if (i + 1) % 200 == 0:
                print(f"{i + 1}/{len(names)} scanned, {n_pass} pass", flush=True)
    print(f"DONE {n_pass}/{len(names)} pass -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
