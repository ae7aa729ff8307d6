"""GROUP BY ... WITH TOTALS.

Reference: TotalsHavingTransform (src/Processors/Transforms/
TotalsHavingTransform.h:24); totals_mode settings at src/Core/Settings.h:125.
ClickHouse emits the totals as a separate out-of-band block; in a DataFrame
engine the idiomatic equivalent is an appended row with NULL group keys
(exactly what ROLLUP's grand-total row looks like — we reuse Spark's
grouping-sets machinery so it stays one aggregation pass, not two scans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_totals(
    df: DataFrame, group_cols: list[str], aggs: list[Column], having: Column | None = None
) -> DataFrame:
    """Per-group rows + one grand-total row (NULL keys).

    Implemented as GROUPING SETS ((group_cols), ()) — a single aggregation
    over one shuffle; Spark computes both sets in the same hash-agg.
    `having` filters group rows only (totals row always kept, matching
    totals_mode=after_having_inclusive... the default before_having applies
    to rows; we take the common default).
    """
    gs = df.groupingSets([group_cols, []], *[F.col(c) for c in group_cols]).agg(*aggs)
    if having is not None:
        is_total = F.lit(True)
        for c in group_cols:
            is_total = is_total & F.col(c).isNull()
        gs = gs.filter(is_total | having)
    return gs
