"""Rescan the reference stateless corpus through the dialect layer.

Filters to DDL-free candidate files (pure SELECT statements with a
.reference file), runs each through tools.golden.run_golden, and writes the
passing names to stdout / a results file. Used to (re)generate
tests/golden_corpus.txt after dialect improvements.

Usage: python tools/golden_scan.py [out_file]
"""

from __future__ import annotations

import os
import re
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/reference/tests/queries/0_stateless"

# statements we cannot run (mutations, server introspection, shell tests).
# CREATE TABLE / INSERT / DROP TABLE are handled by the runner's catalog
# support; other CREATE kinds and server-state statements are not.
_SKIP = re.compile(
    r"\b(CREATE\s+(?:DATABASE|DICTIONARY|"
    r"FUNCTION|USER|ROLE|QUOTA|POLICY)"
    r"|CREATE\s+(?:MATERIALIZED|LIVE|WINDOW)\s+VIEW"
    r"|ATTACH|DETACH|"
    r"RENAME|SYSTEM\s|KILL|GRANT|REVOKE|SHOW|USE\s|"
    r"WATCH|remote|cluster\(|file\(|url\(|"
    r"system\.(?!numbers\b|numbers_mt\b|one\b|zeros\b))",
    re.IGNORECASE,
)

# memory-limit acceptance tests (serverError 241 from max_memory_usage):
# this engine enforces no memory quota, so the statement either errors by
# luck (flaky pass) or genuinely OOMs the driver — never scan them
_SKIP_NAMES = {
    "01782_field_oom",
    "01784_parallel_formatting_memory",
    # 256-bit integer acceptance tests: Int256/UInt256 map to BIGINT here
    # (documented unsupported, COVERAGE.md); tests asserting 256-bit-only
    # behavior (e.g. range() rejecting UInt256 with code 44) are wontfix
    "01780_range_msan",
}

# Out-of-scope categories (verdict r5 #9): tests whose PASSING would require
# reproducing engine internals this Spark-first design intentionally does
# not have. classify() tags them so scan reports separate "reachable
# remaining" from "out of scope"; they are NOT skipped during scans (a
# category can shrink as features land), only reported separately.
_WONTFIX_NAMES = {
    # byte-exact pcg64/SplitMix RNG streams (generateRandom prints values)
    "01338_sha256_fixedstring": "rng-bitexact",
    "02012_sha512_fixedstring": "rng-bitexact",
    "01254_array_of_unnamed_tuples": "rng-bitexact",
    "02584_range_ipv4": "rng-bitexact",
    # UInt64 column storage order (BIGINT carrier sorts signed)
    "01849_geoToS2": "uint64-order",
}

_WONTFIX_PATTERNS: list[tuple[str, str]] = [
    # EXPLAIN forms that print the reference's internal plan/AST text
    (r"(?i)\bEXPLAIN\s+(PIPELINE|AST|ESTIMATE|PLAN\s+indexes|header\s*=)", "explain-internals"),
    (r"(?i)\bEXPLAIN\s+QUERY\s+TREE\b", "explain-internals"),
    (r"(?i)\bEXPLAIN\s+SYNTAX\b", "explain-syntax-ast-optimizer"),
    # live-updating subscriptions need a server push channel
    (r"(?i)\bWATCH\s+", "watch-liveview"),
    # 128/256-bit integer and Decimal256 value semantics (BIGINT carrier)
    (r"(?i)\btoU?Int(128|256)\s*\(", "wide-integers"),
    (r"(?i)\bDecimal256\b", "wide-integers"),
    # server-internals introspection
    (r"(?i)\bsystem\.(parts|metrics|events|asynchronous_metrics|processes|query_log|text_log|stack_trace)\b", "system-internals"),
    # ICU collation ordering (src/Columns/Collator.cpp): the environment has
    # neither PyICU nor CLDR locale data (setlocale(ru_RU.UTF-8) fails), so
    # COLLATE sort orders cannot be reproduced bit-exact — documented
    # round-7 decision per the advisor's ask
    (r"(?i)\bCOLLATE\s+'", "icu-collation"),
]


def classify(name: str, text: str) -> str:
    """'reachable' or 'wontfix:<reason>' for a candidate test."""
    if name in _WONTFIX_NAMES:
        return f"wontfix:{_WONTFIX_NAMES[name]}"
    for pat, reason in _WONTFIX_PATTERNS:
        if re.search(pat, text):
            return f"wontfix:{reason}"
    return "reachable"


def candidates() -> list[str]:
    names = []
    for f in sorted(os.listdir(BASE)):
        if not f.endswith(".sql"):
            continue
        name = f[:-4]
        if name in _SKIP_NAMES:
            continue
        ref = os.path.join(BASE, name + ".reference")
        if not os.path.exists(ref):
            continue
        try:
            text = open(os.path.join(BASE, f), errors="replace").read()
        except OSError:
            continue
        if len(text) > 20_000 or _SKIP.search(text):
            continue
        names.append(name)
    return names


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def main() -> None:
    import tempfile

    os.chdir(tempfile.mkdtemp(prefix="golden_scan_"))  # isolate spark-warehouse

    from clickhouse_23_3_19_32_lts_spark.session import get_spark
    from tools.golden import run_golden

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/golden_scan_results.txt"
    spark = get_spark(app_name="golden-scan", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    names = candidates()
    print(f"{len(names)} candidate files", flush=True)
    passed: list[str] = []
    signal.signal(signal.SIGALRM, _alarm)
    with open(out_path, "w") as out:
        for i, name in enumerate(names):
            signal.alarm(60)
            try:
                ok, _msg = run_golden(spark, f"{BASE}/{name}.sql", f"{BASE}/{name}.reference")
            except _Timeout:
                ok = False
            except Exception:  # noqa: BLE001 — scan must survive anything
                ok = False
            finally:
                signal.alarm(0)
            if ok:
                passed.append(name)
                out.write(name + "\n")
                out.flush()
            if (i + 1) % 200 == 0:
                print(f"{i + 1}/{len(names)} scanned, {len(passed)} pass", flush=True)
    print(f"DONE {len(passed)}/{len(names)} pass -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
