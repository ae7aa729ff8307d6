"""ANY JOIN — at most one right match per left row.

Reference: JoinStrictness::Any at src/Core/Joins.h:36 (takes an arbitrary
matching row; RightAny at :37 mirrors it). ClickHouse picks whichever row
the hash table surfaces; we make it deterministic: the minimum row by the
ordering columns (or all payload columns) — stable across runs and engines.

Plan: dedupe the right side with a row_number window (one shuffle on the
keys), then an ordinary equi-join. The dedup shuffle replaces the join
build's dedup work; net extra cost is one exchange of the (usually smaller)
right table — acceptable at 100 TB and far cheaper than a join explosion
on duplicate keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_RN = "__any_rn"


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    order: list[Column] | None = None,
) -> DataFrame:
    """ClickHouse `ANY [LEFT|INNER] JOIN`: dedupe right on keys, then join.

    order: explicit tiebreak; defaults to all non-key right columns asc.
    """
    if order is None:
        order = [F.col(c).asc() for c in right.columns if c not in on]
        if not order:  # right is keys-only
            order = [F.lit(1)]
    w = W.partitionBy(*on).orderBy(*order)
    deduped = (
        right.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)
    )
    return left.join(deduped, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """SEMI strictness (src/Core/Joins.h:39) — native left_semi."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """ANTI strictness (src/Core/Joins.h:40) — native left_anti."""
    return left.join(right, on=on, how="left_anti")
