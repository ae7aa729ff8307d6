"""ARRAY JOIN / LEFT ARRAY JOIN — unnest arrays to rows.

Reference: ArrayJoinAction (src/Interpreters/ArrayJoinAction.h:23),
ArrayJoinStep, src/Functions/array/arrayJoin.cpp. LEFT ARRAY JOIN keeps
rows with empty arrays (NULL element), plain ARRAY JOIN drops them —
exactly explode_outer vs explode. Multiple arrays zip positionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def array_join(
    df: DataFrame, cols: list[str], left: bool = False, with_pos: bool = False
) -> DataFrame:
    """Unnest one or more array columns (zipped positionally, like the
    reference's multi-array ARRAY JOIN).

    with_pos adds `__pos` (1-based), ≈ arrayEnumerate() usage.
    """
    if len(cols) == 1:
        c = cols[0]
        fn = F.posexplode_outer if (left and with_pos) else (
            F.posexplode if with_pos else (F.explode_outer if left else F.explode)
        )
        others = [x for x in df.columns if x != c]
        if with_pos:
            out = df.select(*others, fn(c).alias("__pos0", c))
            return out.withColumn("__pos", F.col("__pos0") + 1).drop("__pos0")
        return df.select(*others, fn(c).alias(c))

    # multi-array: zip into structs then explode once
    zipped = F.arrays_zip(*[F.col(c) for c in cols])
    others = [x for x in df.columns if x not in cols]
    fn = F.posexplode_outer if (left and with_pos) else (
        F.posexplode if with_pos else (F.explode_outer if left else F.explode)
    )
    if with_pos:
        out = df.select(*others, fn(zipped).alias("__pos0", "__z"))
        out = out.withColumn("__pos", F.col("__pos0") + 1).drop("__pos0")
    else:
        out = df.select(*others, fn(zipped).alias("__z"))
    for c in cols:
        out = out.withColumn(c, F.col(f"__z.{c}"))
    return out.drop("__z")
