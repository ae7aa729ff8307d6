"""Mergeable aggregate states — the -State / -Merge combinators.

Reference: src/AggregateFunctions/AggregateFunctionState.cpp (wrap an
aggregate to RETURN its partial state), AggregateFunctionMerge.cpp (accept
stored states and finish them), src/DataTypes/DataTypeAggregateFunction.cpp
(AggregateFunction(f, T) columns) — the heart of AggregatingMergeTree and
incremental materialized views.

Spark mapping: a -State builder is an aggregate expression whose result is
a serializable partial (scalar, struct, array, or binary sketch); the
matching -Merge builder re-aggregates those partials to the final value.
States survive groupBy → parquet → read → merge, which is exactly the
AggregatingMergeTree lifecycle (partial per part at insert, merge at read).

Families:
  countState/sumState/minState/maxState — the partial IS the scalar
  avgState    — struct(sum, cnt)
  uniqExactState — collect_set (exact; grows with cardinality, use below
                   ~1e6 distinct per group)
  uniqState   — Datasketches HLL binary via hll_sketch_agg (CONSTANT size,
                deterministic merge — the 100 TB shape; matches the
                reference's uniq sketch role, not its byte format)
  quantileState — deterministic hash-threshold sample of the values,
                struct(sample array, n). Mergeable because the union of
                hash-samples IS the hash-sample of the union (same
                predicate); deterministic because the sample key is hashed
                with the portable 60-bit md5 hash, so external engines
                (DuckDB oracle) reproduce the state bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions.registry import chfn, col

# --- scalar states ----------------------------------------------------------


@chfn("countState")
def countState(x) -> Column:
    return F.count(col(x))


@chfn("countMerge")
def countMerge(state) -> Column:
    return F.sum(col(state))


@chfn("sumState")
def sumState(x) -> Column:
    return F.sum(col(x))


@chfn("sumMerge")
def sumMerge(state) -> Column:
    return F.sum(col(state))


@chfn("minState")
def minState(x) -> Column:
    return F.min(col(x))


@chfn("minMerge")
def minMerge(state) -> Column:
    return F.min(col(state))


@chfn("maxState")
def maxState(x) -> Column:
    return F.max(col(x))


@chfn("maxMerge")
def maxMerge(state) -> Column:
    return F.max(col(state))


@chfn("avgState")
def avgState(x) -> Column:
    return F.struct(F.sum(col(x)).alias("sum"), F.count(col(x)).alias("cnt"))


@chfn("avgMerge")
def avgMerge(state) -> Column:
    s = col(state)
    return F.sum(s["sum"]) / F.sum(s["cnt"])


# --- uniq states ------------------------------------------------------------


@chfn("uniqExactState")
def uniqExactState(x) -> Column:
    return F.collect_set(col(x))


@chfn("uniqExactMerge")
def uniqExactMerge(state) -> Column:
    return F.size(F.array_distinct(F.flatten(F.collect_list(col(state)))))


@chfn("uniqState", "uniqHLL12State", "uniqCombinedState")
def uniqState(x) -> Column:
    """HLL sketch partial (Datasketches, lgConfigK default 12) — constant
    ~2-4 KB per group regardless of cardinality."""
    return F.hll_sketch_agg(col(x))


@chfn("uniqMerge", "uniqHLL12Merge", "uniqCombinedMerge")
def uniqMerge(state) -> Column:
    return F.hll_sketch_estimate(F.hll_union_agg(col(state)))


# --- quantile states --------------------------------------------------------

_H60_DEN = 100


def _h60(c: Column) -> Column:
    """Portable 60-bit hash (md5 hex prefix → BIGINT) — same formula the
    dedup sketches and the DuckDB oracles use."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


@chfn("quantileState")
def quantileState(value, sample_key, rate_pct: int = 20) -> Column:
    """Deterministic sampled quantile state: struct(sample, n).

    `sample_key` must be a STABLE discrete column (an integer id — never
    the float value itself, whose string form differs across engines).
    Rows where h60(key) % 100 < rate_pct contribute their value to the
    sample; `n` records the true count. Error ~ 1/sqrt(rate · n) like the
    reference's quantileSampling (AggregateFunctionQuantile.cpp family).
    """
    keep = F.pmod(_h60(col(sample_key)), F.lit(_H60_DEN)) < rate_pct
    return F.struct(
        F.collect_list(F.when(keep, col(value))).alias("sample"),
        F.count(col(value)).alias("n"),
    )


@chfn("quantileMerge")
def quantileMerge(state, q: float = 0.5) -> Column:
    """Merge sampled states and take the discrete quantile:
    element_at(sorted_union, greatest(1, ceil(q * size)))."""
    merged = F.flatten(F.collect_list(col(state)["sample"]))
    s = F.array_sort(merged)
    idx = F.greatest(F.lit(1), F.ceil(F.size(s) * F.lit(float(q))).cast("int"))
    return F.element_at(s, idx)
