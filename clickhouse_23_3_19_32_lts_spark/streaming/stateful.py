"""Custom stateful streaming operators via applyInPandasWithState.

Reference analogue: ClickHouse's incremental materialized views over
AggregatingMergeTree keep per-key running aggregate state across inserts
(StorageMaterializedView.cpp + AggregateFunction columns, SURVEY §2.9/§7
'-State combinators'). Structured Streaming's applyInPandasWithState is the
Spark-native form: per-key state in the state store, updated per
micro-batch, emitting deltas.

running_aggregate(): the general building block — per-key running
(count, sum, min, max) over any numeric column, emitting the updated state
row for keys touched in each batch (outputMode=update semantics). State is
one small tuple per key, partitioned by the grouping key across executors;
at 100 TB of stream history the state size is O(|keys|), not O(rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _output_schema(key_field: str, key_type) -> StructType:
    return StructType(
        [
            StructField(key_field, key_type),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("mn", DoubleType()),
            StructField("mx", DoubleType()),
        ]
    )


def running_aggregate(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    key_type=None,
) -> DataFrame:
    """Per-key running (count, sum, min, max) with persistent state.

    Each micro-batch emits one updated row per touched key — the
    AggregatingMergeTree materialized-view pattern with explicit state.
    """
    key_type = key_type or LongType()
    out_schema = _output_schema(key_col, key_type)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total, mn, mx = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals):
                n += len(vals)
                total += float(vals.sum())
                bmn, bmx = float(vals.min()), float(vals.max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
        state.update((n, total, mn, mx))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "total": [total], "mn": [mn], "mx": [mx]}
        )

    return (
        stream.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
