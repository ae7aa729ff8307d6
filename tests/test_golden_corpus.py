"""Golden-corpus gate: every reference stateless test in golden_corpus.txt
must run through the dialect layer and byte-match its .reference output —
the reference's own test method (SURVEY §5.1) applied to this engine.

The list is the frozen auto-curated subset of /root/reference/tests/queries/
0_stateless/ that is expressible without DDL/streaming/engine-internals;
tools/golden.py documents the formatting rules. Regressions here mean a
dialect or semantics break, so the whole list runs in CI.
"""

from __future__ import annotations

import os

import pytest

from tools.golden import run_golden

BASE = "/root/reference/tests/queries/0_stateless"
LIST = os.path.join(os.path.dirname(__file__), "golden_corpus.txt")

with open(LIST) as fh:
    CORPUS = [line.strip() for line in fh if line.strip()]

# Optional sharding for environments that reap long-busy JVMs (round 9: the
# sandbox silently killed the session JVM 20-40 min into three full-suite
# runs — no hs_err, no kernel OOM record — cascading ConnectionRefused over
# every later test; each "failed" test passes in isolation). Set
# SPARK_GRAFT_GOLDEN_SHARD="i/n" to run the i-th of n interleaved slices in
# its own pytest process. Unset (the default, and what CI/the driver runs)
# = the full corpus in one process.
_SHARD = os.environ.get("SPARK_GRAFT_GOLDEN_SHARD")
if _SHARD:
    _i, _n = (int(x) for x in _SHARD.split("/"))
    CORPUS = [c for _j, c in enumerate(CORPUS) if _j % _n == _i]


_RESET_EVERY = 100
_run_count = [0]


def _periodic_session_reset(spark):
    """One shared session runs the whole ~1300-test corpus; cached plans,
    leftover temp views and accumulated catalog state slow the tail and can
    eventually kill the JVM. Every _RESET_EVERY tests, drop what tests left
    behind (keeps a long run's per-test cost flat)."""
    _run_count[0] += 1
    if _run_count[0] % _RESET_EVERY:
        return
    try:
        spark.catalog.clearCache()
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                try:
                    spark.catalog.dropTempView(tbl.name)
                except Exception:  # noqa: BLE001
                    pass
    except Exception:  # noqa: BLE001
        pass


@pytest.mark.skipif(not os.path.isdir(BASE), reason="reference corpus not present")
@pytest.mark.parametrize("name", CORPUS)
def test_golden(name, spark):
    _periodic_session_reset(spark)
    # per-test guard: a JVM-side runaway can't be interrupted by SIGALRM
    # alone (the py4j recv blocks), so cancel Spark jobs from a watchdog
    import signal
    import threading

    class _TO(Exception):
        pass

    old = signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_TO()))
    sc = spark.sparkContext
    dog = threading.Timer(160.0, lambda: sc.cancelAllJobs())
    dog.daemon = True
    dog.start()
    # 150s, not 90: under a full-suite run a handful of tests (02000/02003/
    # 02004) are load-sensitive and blew a 90s budget while passing in
    # seconds alone — the watchdog is a runaway guard, not a perf gate
    signal.alarm(150)
    try:
        ok, msg = run_golden(
            spark, f"{BASE}/{name}.sql", f"{BASE}/{name}.reference"
        )
    except _TO:
        pytest.fail(f"{name}: timed out after 150s")
    finally:
        signal.alarm(0)
        dog.cancel()
        signal.signal(signal.SIGALRM, old)
    assert ok, msg
