"""Vector distance / norm family — the LLM-pipeline north star.

Reference: src/Functions/array/arrayDistance.cpp:514-519 (L1Distance,
L2Distance, L2SquaredDistance, LpDistance, LinfDistance, cosineDistance),
arrayNorm.cpp, arrayDotProduct (vectorFunctions.cpp).

Pure higher-order-function formulations (zip_with + aggregate) — JVM-side,
no Python. At 100 TB these run inside whole-stage codegen over the
embeddings column; the ANN operators in operators/similarity.py build on
them (brute-force) and on bucketed LSH (scale path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions.registry import chfn, col

__all__ = [
    "dotProduct", "L1Norm", "L2Norm", "L2SquaredNorm", "LinfNorm", "LpNorm",
    "L1Distance", "L2Distance", "L2SquaredDistance", "LinfDistance",
    "LpDistance", "cosineDistance", "L1Normalize", "L2Normalize",
]


def _dsum(arr: Column, fn) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + fn(x.cast("double")))


@chfn("dotProduct", "scalarProduct", "arrayDotProduct")
def dotProduct(a, b) -> Column:
    return F.aggregate(
        F.zip_with(col(a), col(b), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@chfn("L1Norm")
def L1Norm(a) -> Column:
    return _dsum(col(a), F.abs)


@chfn("L2Norm")
def L2Norm(a) -> Column:
    return F.sqrt(_dsum(col(a), lambda x: x * x))


@chfn("L2SquaredNorm")
def L2SquaredNorm(a) -> Column:
    return _dsum(col(a), lambda x: x * x)


@chfn("LinfNorm")
def LinfNorm(a) -> Column:
    return F.array_max(F.transform(col(a), lambda x: F.abs(x.cast("double"))))


@chfn("LpNorm")
def LpNorm(a, p: float) -> Column:
    return F.pow(_dsum(col(a), lambda x: F.pow(F.abs(x), p)), 1.0 / p)


@chfn("L1Distance")
def L1Distance(a, b) -> Column:
    return F.aggregate(
        F.zip_with(col(a), col(b), lambda x, y: F.abs(x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@chfn("L2Distance", "distance")
def L2Distance(a, b) -> Column:
    return F.sqrt(L2SquaredDistance(a, b))


@chfn("L2SquaredDistance")
def L2SquaredDistance(a, b) -> Column:
    return F.aggregate(
        F.zip_with(col(a), col(b), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@chfn("LinfDistance")
def LinfDistance(a, b) -> Column:
    return F.array_max(
        F.zip_with(col(a), col(b), lambda x, y: F.abs(x.cast("double") - y))
    )


@chfn("LpDistance")
def LpDistance(a, b, p: float) -> Column:
    return F.pow(
        F.aggregate(
            F.zip_with(col(a), col(b), lambda x, y: F.pow(F.abs(x.cast("double") - y), p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        1.0 / p,
    )


@chfn("cosineDistance")
def cosineDistance(a, b) -> Column:
    """1 - cos_sim; single pass accumulating (dot, na, nb) in one struct."""
    acc = F.aggregate(
        F.zip_with(col(a), col(b), lambda x, y: F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))),
        F.struct(F.lit(0.0).alias("d"), F.lit(0.0).alias("na"), F.lit(0.0).alias("nb")),
        lambda s, v: F.struct(
            (s.d + v.x * v.y).alias("d"),
            (s.na + v.x * v.x).alias("na"),
            (s.nb + v.y * v.y).alias("nb"),
        ),
        lambda s: 1.0 - s.d / (F.sqrt(s.na) * F.sqrt(s.nb)),
    )
    return acc


@chfn("L1Normalize")
def L1Normalize(a) -> Column:
    n = L1Norm(a)
    return F.transform(col(a), lambda x: x.cast("double") / n)


@chfn("L2Normalize")
def L2Normalize(a) -> Column:
    n = L2Norm(a)
    return F.transform(col(a), lambda x: x.cast("double") / n)
