"""LIMIT n BY cols — top-n rows per group.

Reference: LimitByTransform (/root/reference/src/Processors/Transforms/
LimitByTransform.h:10) keeps the first n rows per distinct key tuple in
stream order; with ORDER BY it is a bounded per-group top-n.

Spark form: row_number over (partition by keys order by sort) <= n — one
shuffle on the keys, rank computed per-partition, filter pushed after the
window. At scale this is the standard top-n-per-group plan; no driver-side
work, and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_RN = "__limit_by_rn"


def limit_by(
    df: DataFrame,
    by: list[str | Column],
    order: list[str | Column],
    n: int,
    offset: int = 0,
) -> DataFrame:
    """Keep rows ``offset+1 .. offset+n`` per ``by`` group, ranked by ``order``.

    ClickHouse `LIMIT [offset,] n BY expr_list`. Ordering must be total per
    group for deterministic output (append a unique tiebreak column).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    w = W.partitionBy(*by).orderBy(*order)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter((F.col(_RN) > offset) & (F.col(_RN) <= offset + n))
        .drop(_RN)
    )
