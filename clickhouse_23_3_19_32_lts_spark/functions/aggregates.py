"""Aggregate-function builders (SURVEY §2.4, registry
src/AggregateFunctions/registerAggregateFunctions.cpp:12-93).

Each ClickHouse aggregate name returns a Spark Column usable inside
groupBy().agg(...) / over(window). Combinator forms (-If, -OrNull,
-Distinct) are registered as explicit names (sumIf, avgOrNull, ...), the
way ClickHouse materializes them at parse time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions.registry import chfn, col


# -- core --------------------------------------------------------------------


@chfn("count")
def count(c=None) -> Column:
    """count() / count(x) (zero-arg form counts rows)."""
    return F.count(F.lit(1)) if c is None else F.count(col(c))


@chfn("sum")
def sum_(c) -> Column:
    return F.sum(col(c))


@chfn("min")
def min_(c) -> Column:
    return F.min(col(c))


@chfn("max")
def max_(c) -> Column:
    return F.max(col(c))


@chfn("avg")
def avg(c) -> Column:
    return F.avg(col(c))


@chfn("avgWeighted")
def avgWeighted(x, w) -> Column:
    """avgWeighted(x, w) = sum(x·w)/sum(w) (AggregateFunctionAvgWeighted)."""
    return F.sum(col(x) * col(w)) / F.sum(col(w))


@chfn("sumCount")
def sumCount(c) -> Column:
    """sumCount(x) → struct(sum, count) (AggregateFunctionSumCount.cpp)."""
    return F.struct(F.sum(col(c)).alias("sum"), F.count(col(c)).alias("count"))


@chfn("any")
def any_(c) -> Column:
    """any(x): first non-null value (AggregateFunctionAny.cpp)."""
    return F.first(col(c), ignorenulls=True)


@chfn("anyLast")
def anyLast(c) -> Column:
    return F.last(col(c), ignorenulls=True)


@chfn("argMin")
def argMin(arg, val) -> Column:
    return F.min_by(col(arg), col(val))


@chfn("argMax")
def argMax(arg, val) -> Column:
    return F.max_by(col(arg), col(val))


# -- uniq family -------------------------------------------------------------


@chfn("uniq", "uniqCombined", "uniqCombined64", "uniqHLL12")
def uniq(*cs) -> Column:
    """uniq*: HLL approximate distinct (AggregateFunctionUniq.cpp)."""
    return F.approx_count_distinct(F.struct(*[col(c) for c in cs]) if len(cs) > 1 else col(cs[0]))


@chfn("uniqExact")
def uniqExact(*cs) -> Column:
    return F.countDistinct(*[col(c) for c in cs])


@chfn("uniqUpTo")
def uniqUpTo(n: int, c) -> Column:
    """uniqUpTo(N)(x): exact distinct count capped at N+1."""
    return F.least(F.countDistinct(col(c)), F.lit(n + 1))


# -- quantiles ---------------------------------------------------------------


@chfn("quantile", "quantileExact", "quantileExactWeighted", "quantileDeterministic")
def quantile(c, q: float = 0.5) -> Column:
    return F.percentile(col(c), F.lit(q))


@chfn("quantiles", "quantilesExact")
def quantiles(c, *qs: float) -> Column:
    return F.percentile(col(c), F.array(*[F.lit(q) for q in qs]))


@chfn("median")
def median(c) -> Column:
    return F.median(col(c))


@chfn("quantileTDigest", "quantileBFloat16", "quantileTiming")
def quantileTDigest(c, q: float = 0.5) -> Column:
    """Sketch-based quantiles → percentile_approx (engine-specific sketch)."""
    return F.percentile_approx(col(c), F.lit(q))


# -- statistics --------------------------------------------------------------


@chfn("stddevPop")
def stddevPop(c) -> Column:
    return F.stddev_pop(col(c))


@chfn("stddevSamp")
def stddevSamp(c) -> Column:
    return F.stddev_samp(col(c))


@chfn("varPop")
def varPop(c) -> Column:
    return F.var_pop(col(c))


@chfn("varSamp")
def varSamp(c) -> Column:
    return F.var_samp(col(c))


@chfn("covarPop")
def covarPop(x, y) -> Column:
    return F.covar_pop(col(x), col(y))


@chfn("covarSamp")
def covarSamp(x, y) -> Column:
    return F.covar_samp(col(x), col(y))


@chfn("corr")
def corr(x, y) -> Column:
    return F.corr(col(x), col(y))


@chfn("skewPop")
def skewPop(c) -> Column:
    return F.skewness(col(c))


@chfn("kurtPop")
def kurtPop(c) -> Column:
    return F.kurtosis(col(c))


@chfn("skewSamp")
def skewSamp(c) -> Column:
    """Sample-adjusted skewness G1 from population g1 (the conversion the
    q_stats_moments oracle query documents)."""
    n = F.count(col(c)).cast("double")
    g1 = F.skewness(col(c))
    return g1 * F.sqrt(n * (n - 1)) / (n - 2)


@chfn("kurtSamp")
def kurtSamp(c) -> Column:
    n = F.count(col(c)).cast("double")
    g2 = F.kurtosis(col(c))
    return ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))


# -- arrays / collections ----------------------------------------------------


@chfn("groupArray")
def groupArray(c) -> Column:
    return F.collect_list(col(c))


@chfn("groupUniqArray")
def groupUniqArray(c) -> Column:
    return F.collect_set(col(c))


@chfn("groupArraySorted")
def groupArraySorted(c) -> Column:
    return F.sort_array(F.collect_list(col(c)))


@chfn("groupBitAnd")
def groupBitAnd(c) -> Column:
    return F.bit_and(col(c))


@chfn("groupBitOr")
def groupBitOr(c) -> Column:
    return F.bit_or(col(c))


@chfn("groupBitXor")
def groupBitXor(c) -> Column:
    return F.bit_xor(col(c))


@chfn("boundingRatio")
def boundingRatio(x, y) -> Column:
    """boundingRatio(x, y): slope (maxY-minY)/(maxX-minX)."""
    return (F.max(col(y)) - F.min(col(y))) / (F.max(col(x)) - F.min(col(x)))


# -- combinators (-If, -OrNull, -Distinct) -----------------------------------


def _if(agg, c, cond) -> Column:
    return agg(F.when(col(cond) if isinstance(cond, str) else cond, col(c)))


@chfn("sumIf")
def sumIf(c, cond) -> Column:
    return _if(F.sum, c, cond)


@chfn("countIf")
def countIf(cond) -> Column:
    return F.count(F.when(col(cond) if isinstance(cond, str) else cond, F.lit(1)))


@chfn("avgIf")
def avgIf(c, cond) -> Column:
    return _if(F.avg, c, cond)


@chfn("minIf")
def minIf(c, cond) -> Column:
    return _if(F.min, c, cond)


@chfn("maxIf")
def maxIf(c, cond) -> Column:
    return _if(F.max, c, cond)


@chfn("uniqIf")
def uniqIf(c, cond) -> Column:
    return F.approx_count_distinct(F.when(col(cond) if isinstance(cond, str) else cond, col(c)))


@chfn("sumOrNull")
def sumOrNull(c) -> Column:
    """-OrNull: NULL on empty set — Spark's default aggregate behavior."""
    return F.sum(col(c))


@chfn("countDistinct")
def countDistinct(*cs) -> Column:
    return F.countDistinct(*[col(c) for c in cs])


@chfn("sumDistinct")
def sumDistinct(c) -> Column:
    return F.sum_distinct(col(c))


@chfn("avgDistinct")
def avgDistinct(c) -> Column:
    return F.sum_distinct(col(c)) / F.count_distinct(col(c))
