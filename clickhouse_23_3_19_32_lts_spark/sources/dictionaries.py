"""External dictionaries: dictGet* as broadcast-join lookups.

Reference: src/Functions/FunctionsExternalDictionaries.cpp:8 (dictGet
family), layouts in src/Dictionaries/ — flat/hashed/cache collapse to one
Spark shape (broadcast hash join against a small dimension frame);
range_hashed (src/Dictionaries/RangeHashedDictionary.h:56,287) becomes a
broadcast range-condition join (point-in-interval lookup).

At 100 TB the dictionary is broadcast once per stage and every lookup is a
map-side hash probe — the exact cost model of the reference's in-RAM
dictionaries, but cluster-wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Dictionary:
    """dictGet(dict, attrs, key): broadcast lookup with per-attr defaults.

    >>> d = Dictionary(nation_df, key="n_nationkey")
    >>> df2 = d.get(df, df.c_nationkey, {"n_name": "UNKNOWN"})
    """

    def __init__(self, source: DataFrame, key: str):
        self.source = source
        self.key = key

    def get(
        self,
        df: DataFrame,
        key_expr: Column | str,
        attrs: dict[str, object] | list[str],
    ) -> DataFrame:
        """Attach attribute columns; missing keys get the attr's default
        (dictGetOrDefault) or NULL when defaults is a plain list (dictGetOrNull)."""
        if isinstance(attrs, list):
            attrs = {a: None for a in attrs}
        key_col = F.col(key_expr) if isinstance(key_expr, str) else key_expr
        dim = self.source.select(
            F.col(self.key).alias("__dict_key"), *[F.col(a) for a in attrs]
        )
        out = df.join(F.broadcast(dim), key_col == F.col("__dict_key"), "left").drop(
            "__dict_key"
        )
        for attr, default in attrs.items():
            if default is not None:
                out = out.withColumn(attr, F.coalesce(F.col(attr), F.lit(default)))
        return out

    def has(self, df: DataFrame, key_expr: Column | str, as_col: str = "dict_has") -> DataFrame:
        """dictHas(dict, key) → boolean column."""
        key_col = F.col(key_expr) if isinstance(key_expr, str) else key_expr
        dim = self.source.select(F.col(self.key).alias("__dict_key")).distinct()
        return (
            df.join(F.broadcast(dim), key_col == F.col("__dict_key"), "left")
            .withColumn(as_col, F.col("__dict_key").isNotNull())
            .drop("__dict_key")
        )


class RangeHashedDictionary:
    """range_hashed layout: dictGet(d, attr, key, point) where the match is
    key equality AND point ∈ [range_start, range_end] — e.g. slowly-changing
    dimensions keyed by validity interval."""

    def __init__(self, source: DataFrame, key: str, range_start: str, range_end: str):
        self.source = source
        self.key = key
        self.lo = range_start
        self.hi = range_end

    def get(
        self,
        df: DataFrame,
        key_expr: Column | str,
        point_expr: Column | str,
        attrs: list[str],
    ) -> DataFrame:
        key_col = F.col(key_expr) if isinstance(key_expr, str) else key_expr
        point = F.col(point_expr) if isinstance(point_expr, str) else point_expr
        dim = self.source.select(
            F.col(self.key).alias("__dict_key"),
            F.col(self.lo).alias("__lo"),
            F.col(self.hi).alias("__hi"),
            *[F.col(a) for a in attrs],
        )
        return (
            df.join(
                F.broadcast(dim),
                (key_col == F.col("__dict_key")) & point.between(F.col("__lo"), F.col("__hi")),
                "left",
            )
            .drop("__dict_key", "__lo", "__hi")
        )
