"""Golden-corpus gate: every reference stateless test in golden_corpus.txt
must run through the dialect layer and byte-match its .reference output —
the reference's own test method (SURVEY §5.1) applied to this engine.

The list is the frozen auto-curated subset of /root/reference/tests/queries/
0_stateless/ that is expressible without DDL/streaming/engine-internals;
tools/golden.py documents the formatting rules. Regressions here mean a
dialect or semantics break, so the whole list runs in CI.

Execution model (round 10): the corpus runs as N subprocess chunks, each
with its OWN short-lived JVM (tools/golden_chunk.py). Round 9 proved that
one shared JVM kept busy for 20-40 minutes gets silently reaped by the
sandbox (no hs_err, no kernel OOM log; each "failed" test passes alone),
and that a 16g heap cap alone does not prevent it. Chunked subprocesses
bound per-JVM busy time to a few minutes. Set SPARK_GRAFT_GOLDEN_INPROC=1
to fall back to the old in-process per-test parametrization for debugging
(e.g. `SPARK_GRAFT_GOLDEN_INPROC=1 pytest -k 01354`).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

BASE = "/root/reference/tests/queries/0_stateless"
LIST = os.path.join(os.path.dirname(__file__), "golden_corpus.txt")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

with open(LIST) as fh:
    CORPUS = [line.strip() for line in fh if line.strip()]

_INPROC = os.environ.get("SPARK_GRAFT_GOLDEN_INPROC")

# ~130 tests per chunk: ~2-4 min of JVM busy time each, far below the
# observed 20-40 min reap horizon, while keeping JVM startup overhead
# (~15 s/chunk) a small fraction of the corpus wall time.
_NCHUNKS = max(1, (len(CORPUS) + 129) // 130)

# Two chunk subprocesses in flight (guide §2.6 overlap-independent-jobs):
# each runs local[8], so the pair fits the sandbox with headroom and the
# corpus wall time roughly halves vs sequential chunks.
_CONCURRENCY = 2


def _run_chunk(chunk: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "golden_chunk.py"),
         str(chunk), str(_NCHUNKS)],
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=REPO,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        return {
            "chunk": chunk,
            "total": 0,
            "passed": 0,
            "failed": [{
                "name": f"<chunk {chunk} harness>",
                "msg": (
                    f"no JSON result (rc={proc.returncode}); "
                    f"stderr tail: {proc.stderr[-1500:]}"
                ),
            }],
        }
    return json.loads(lines[-1])


@pytest.fixture(scope="module")
def chunk_results():
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=_CONCURRENCY) as pool:
        return dict(zip(range(_NCHUNKS), pool.map(_run_chunk, range(_NCHUNKS))))


@pytest.mark.skipif(not os.path.isdir(BASE), reason="reference corpus not present")
@pytest.mark.skipif(bool(_INPROC), reason="in-process mode selected")
@pytest.mark.parametrize("chunk", range(_NCHUNKS))
def test_golden_chunk(chunk, chunk_results):
    res = chunk_results[chunk]
    assert not res["failed"], (
        f"chunk {chunk}/{_NCHUNKS}: {len(res['failed'])}/{res['total']} failed:\n"
        + "\n".join(f"  {f['name']}: {f['msg'][:400]}" for f in res["failed"])
    )


if _INPROC:

    @pytest.mark.skipif(
        not os.path.isdir(BASE), reason="reference corpus not present"
    )
    @pytest.mark.parametrize("name", CORPUS)
    def test_golden(name, spark):
        # per-test guard: a JVM-side runaway can't be interrupted by SIGALRM
        # alone (the py4j recv blocks), so cancel Spark jobs from a watchdog
        import signal
        import threading

        from tools.golden import run_golden

        class _TO(Exception):
            pass

        old = signal.signal(
            signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_TO())
        )
        sc = spark.sparkContext
        dog = threading.Timer(160.0, lambda: sc.cancelAllJobs())
        dog.daemon = True
        dog.start()
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
