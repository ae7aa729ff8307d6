"""Golden-corpus coverage report: corpus size, reachable remaining, and
out-of-scope (wontfix) category counts — separates what dialect work can
still win from what would require reproducing reference internals
(tools/golden_scan.classify).

Usage: python tools/golden_report.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.golden_scan import BASE, candidates, classify  # noqa: E402


def main() -> None:
    passed = set(
        open(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tests",
                "golden_corpus.txt",
            )
        )
        .read()
        .split()
    )
    counts: dict[str, int] = {}
    for n in candidates():
        if n in passed:
            continue
        text = open(f"{BASE}/{n}.sql", errors="replace").read()
        c = classify(n, text)
        counts[c] = counts.get(c, 0) + 1
    total = len(candidates())
    print(f"corpus (passing): {len(passed)}")
    print(f"candidates:       {total}")
    for k, v in sorted(counts.items(), key=lambda kv: -kv[1]):
        print(f"{v:5d}  {k}")


if __name__ == "__main__":
    main()
