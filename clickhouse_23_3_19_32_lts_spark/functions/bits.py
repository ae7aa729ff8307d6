"""Bit-manipulation family.

Reference: src/Functions/bitAnd.cpp, bitOr.cpp, bitXor.cpp, bitNot.cpp,
bitShiftLeft.cpp, bitShiftRight.cpp, bitRotateLeft.cpp, bitTest.cpp,
bitCount.cpp, bitHammingDistance.cpp.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions.registry import chfn, col

__all__ = [
    "bitAnd", "bitOr", "bitXor", "bitNot", "bitShiftLeft", "bitShiftRight",
    "bitRotateLeft", "bitRotateRight", "bitTest", "bitTestAll", "bitTestAny",
    "bitCount", "bitHammingDistance",
]


@chfn("bitAnd")
def bitAnd(a, b) -> Column:
    return col(a).bitwiseAND(col(b))


@chfn("bitOr")
def bitOr(a, b) -> Column:
    return col(a).bitwiseOR(col(b))


@chfn("bitXor")
def bitXor(a, b) -> Column:
    return col(a).bitwiseXOR(col(b))


@chfn("bitNot")
def bitNot(a) -> Column:
    return F.bitwise_not(col(a))


@chfn("bitShiftLeft")
def bitShiftLeft(a, n) -> Column:
    if isinstance(n, int):
        return F.shiftleft(col(a), n)
    # Column shift amount: Spark's shiftleft only takes a literal int
    return (col(a) * F.pow(F.lit(2.0), col(n)).cast("long")).cast("long")


@chfn("bitShiftRight")
def bitShiftRight(a, n) -> Column:
    if isinstance(n, int):
        return F.shiftright(col(a), n)
    return F.floor(col(a) / F.pow(F.lit(2.0), col(n))).cast("long")


@chfn("bitRotateLeft")
def bitRotateLeft(a, n: int, width: int = 64) -> Column:
    c = col(a)
    return F.shiftleft(c, n).bitwiseOR(F.shiftrightunsigned(c, width - n))


@chfn("bitRotateRight")
def bitRotateRight(a, n: int, width: int = 64) -> Column:
    c = col(a)
    return F.shiftrightunsigned(c, n).bitwiseOR(F.shiftleft(c, width - n))


@chfn("bitTest")
def bitTest(a, n) -> Column:
    if isinstance(n, int):
        return F.shiftrightunsigned(col(a), n).bitwiseAND(F.lit(1)).cast("int")
    return (F.floor(col(a) / F.pow(F.lit(2.0), col(n))).cast("long") % 2).cast("int")


@chfn("bitTestAll")
def bitTestAll(a, *bits) -> Column:
    out = F.lit(True)
    for b in bits:
        out = out & (bitTest(a, b) == 1)
    return out


@chfn("bitTestAny")
def bitTestAny(a, *bits) -> Column:
    out = F.lit(False)
    for b in bits:
        out = out | (bitTest(a, b) == 1)
    return out


@chfn("bitCount")
def bitCount(a) -> Column:
    return F.bit_count(col(a)).cast("int")


@chfn("bitHammingDistance")
def bitHammingDistance(a, b) -> Column:
    return F.bit_count(col(a).bitwiseXOR(col(b))).cast("int")
