"""ASOF JOIN — nearest-preceding (or following) match on an ordering key.

Reference: ASOF strictness at src/Core/Joins.h:38, inequalities at
src/Core/Joins.h:56 (Less/Greater/LessOrEquals/GreaterOrEquals), row lookup
in src/Interpreters/RowRefs.cpp (sorted per-key arrays binary-searched).

Spark has no native ASOF. This implementation uses the union+window plan:

    tag(left) ∪ tag(right)
      → window over (by-keys) ordered by (ts, side)
      → last(right_payload ignorenulls) per row
      → keep left rows

One shuffle on the by-keys total — the same cost as the equi-join part of
any join — and no range explosion; at 100 TB this beats a range-join
(O(n·m) per key) and beats per-group merge_asof (Python). Ties are settled
by ordering the right side before (inclusive) or after (strict) left rows
at equal ts. Among equal-ts right rows the last by payload order wins —
deterministic because the sort key includes the payload struct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | tuple[str, str],
    by: list[str] | None = None,
    strictness: str = "<=",
    how: str = "left",
    right_prefix: str = "",
) -> DataFrame:
    """ASOF join: for each left row, the single right row nearest in `on`.

    strictness: '<='  right.on <= left.on, greatest right.on  (default)
                '<'   right.on <  left.on
                '>='  right.on >= left.on, smallest right.on
                '>'   right.on >  left.on
    how: 'left' keeps unmatched left rows (ClickHouse LEFT ASOF), 'inner'
         drops them (ClickHouse ASOF).
    right_prefix: prepended to right's payload column names on clash.
    """
    if strictness not in ("<=", "<", ">=", ">"):
        raise ValueError(f"strictness {strictness!r}")
    by = by or []
    lon, ron = (on, on) if isinstance(on, str) else on

    right_payload_cols = [c for c in right.columns if c not in by]
    out_names = {
        c: (right_prefix + c if c in left.columns else c) for c in right_payload_cols
    }

    # Inclusive: right sorts before left at equal ts (visible to the window).
    # Strict: right sorts after left (excluded by ROWS ... CURRENT ROW).
    inclusive = strictness in ("<=", ">=")
    backward = strictness in ("<=", "<")

    lhs = left.select(
        *[F.col(c).alias(c) for c in by],
        F.col(lon).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_left"),
        F.lit(None).alias(_PAYLOAD),
    )
    # Build right payload struct with target output names.
    rhs = right.select(
        *[F.col(c).alias(c) for c in by],
        F.col(ron).alias(_TS),
        F.lit(0 if inclusive else 2).alias(_SIDE),
        F.lit(None).alias("__asof_left"),
        F.struct(
            *[F.col(c).alias(out_names[c]) for c in right_payload_cols]
        ).alias(_PAYLOAD),
    )
    # Align payload types: lhs null payload must match rhs struct type.
    payload_type = rhs.schema[_PAYLOAD].dataType
    left_struct_type = lhs.schema["__asof_left"].dataType
    lhs = lhs.withColumn(_PAYLOAD, F.lit(None).cast(payload_type))
    rhs = rhs.withColumn("__asof_left", F.lit(None).cast(left_struct_type))

    unioned = lhs.unionByName(rhs)

    order = [F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_PAYLOAD).asc()]
    if not backward:
        order = [F.col(_TS).desc(), F.col(_SIDE).asc(), F.col(_PAYLOAD).desc()]
    w = (
        W.partitionBy(*by).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        if by
        else W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    )

    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    result = matched.select(
        *[F.col(f"__asof_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"{_PAYLOAD}.{out_names[c]}").alias(out_names[c]) for c in right_payload_cols],
    )
    if how == "inner":
        # any right payload field non-null ⇒ matched (payload itself null means no match)
        result = matched.filter(F.col(_PAYLOAD).isNotNull()).select(
            *[F.col(f"__asof_left.{c}").alias(c) for c in left.columns],
            *[F.col(f"{_PAYLOAD}.{out_names[c]}").alias(out_names[c]) for c in right_payload_cols],
        )
    return result
