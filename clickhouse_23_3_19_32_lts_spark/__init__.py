"""PySpark-native analytics engine with the query and data-processing
capabilities of ClickHouse 23.3 LTS (reference: lukoou3/ClickHouse-23.3.19.32-lts).

Not a port: tables are partitioned Parquet read as DataFrames, queries are
Catalyst logical plans (DataFrame / Spark SQL), aggregation and joins use
Spark's native partial/final hash agg and broadcast/sort-merge join machinery.
ClickHouse-specific surface (function names, ASOF/ANY joins, LIMIT BY,
WITH FILL, MergeTree table policies, event-analytics aggregates, dedup
sketches) is provided as library code on top.

Layout (per SURVEY.md §7):
  engine.py        -- Engine: session wrapper + table registry over parquet dirs
  session.py       -- tuned local SparkSession builder
  functions/       -- ClickHouse scalar-function name -> Spark Column builders
  operators/       -- ASOF/ANY join, LIMIT BY, WITH FILL, TOTALS, dedup, ANN,
                      text analysis, event analytics
  sources/         -- readers + table functions (numbers, generateRandom, ...)
  plans/           -- plan inspection helpers (pushdown/broadcast assertions)
  streaming/       -- tumble/hop/watermark wrappers over Structured Streaming
  tablepolicies.py -- MergeTree-family semantics (Replacing/Summing/... + FINAL)
"""

from clickhouse_23_3_19_32_lts_spark.engine import Engine
from clickhouse_23_3_19_32_lts_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
