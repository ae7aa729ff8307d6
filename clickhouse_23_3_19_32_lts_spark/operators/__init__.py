"""Operators ClickHouse has but Spark lacks natively, as library functions.

Each operator is a DataFrame -> DataFrame combinator built from Catalyst
primitives (window functions, joins, higher-order functions) — never
driver-side loops — so plans stay distributed and optimizable.
"""

from clickhouse_23_3_19_32_lts_spark.operators.limit_by import limit_by

__all__ = ["limit_by"]
