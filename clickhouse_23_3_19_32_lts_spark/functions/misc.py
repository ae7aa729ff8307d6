"""Introspection / formatting / row-order misc family.

Reference: src/Functions/currentDatabase.cpp, hostName.cpp, version.cpp,
formatReadableSize.cpp, bar.cpp, runningDifference.h, neighbor.cpp,
sleep.cpp, isConstant.cpp, identity.cpp.

runningDifference/neighbor are deprecated row-order functions in the
reference; here they are window expressions requiring an explicit ordering
(ClickHouse's block-order dependence doesn't exist in a shuffled engine —
callers pass the window).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions.registry import chfn, col

__all__ = [
    "currentDatabase", "hostName", "version", "uptime", "sleep_",
    "identity", "materialize", "ignore", "isConstant", "rowNumberInAllBlocks",
    "formatReadableSize", "formatReadableQuantity", "formatReadableDecimalSize",
    "formatReadableTimeDelta", "bar", "runningDifference", "neighbor",
    "greatCircleDistance", "geoDistance",
]


@chfn("currentDatabase")
def currentDatabase() -> Column:
    return F.lit("default")


@chfn("hostName", "hostname")
def hostName() -> Column:
    import socket

    return F.lit(socket.gethostname())


@chfn("version")
def version() -> Column:
    return F.lit("23.3.19.32-spark")


@chfn("uptime")
def uptime() -> Column:
    return F.lit(0).cast("long")


@chfn("sleep", "sleepEachRow")
def sleep_(seconds) -> Column:
    """No-op (test-harness function in the reference)."""
    return F.lit(0)


@chfn("identity")
def identity(x) -> Column:
    return col(x)


@chfn("materialize")
def materialize(x) -> Column:
    return col(x)


@chfn("ignore")
def ignore(*xs) -> Column:
    return F.lit(0)


@chfn("isConstant")
def isConstant(x) -> Column:
    return F.lit(0)


@chfn("rowNumberInAllBlocks")
def rowNumberInAllBlocks() -> Column:
    return F.monotonically_increasing_id()


def _readable(x, base: int, units: list[str], suffix: str) -> Column:
    c = col(x).cast("double")
    out = F.format_string(f"%.2f {units[0]}{suffix}", c)
    scale = 1.0
    for u in units[1:]:
        scale *= base
        out = F.when(
            F.abs(c) >= scale, F.format_string(f"%.2f {u}{suffix}", c / scale)
        ).otherwise(out)
    return out


@chfn("formatReadableSize")
def formatReadableSize(x) -> Column:
    return _readable(x, 1024, ["B", "KiB", "MiB", "GiB", "TiB", "PiB"], "")


@chfn("formatReadableDecimalSize")
def formatReadableDecimalSize(x) -> Column:
    return _readable(x, 1000, ["B", "KB", "MB", "GB", "TB", "PB"], "")


@chfn("formatReadableQuantity")
def formatReadableQuantity(x) -> Column:
    c = col(x).cast("double")
    return (
        F.when(F.abs(c) >= 1e12, F.format_string("%.2f trillion", c / 1e12))
        .when(F.abs(c) >= 1e9, F.format_string("%.2f billion", c / 1e9))
        .when(F.abs(c) >= 1e6, F.format_string("%.2f million", c / 1e6))
        .when(F.abs(c) >= 1e3, F.format_string("%.2f thousand", c / 1e3))
        .otherwise(F.format_string("%.2f", c))
    )


@chfn("formatReadableTimeDelta")
def formatReadableTimeDelta(x) -> Column:
    c = col(x).cast("long")
    days, rem = (c / 86400).cast("long"), c % 86400
    hours, rem2 = (rem / 3600).cast("long"), rem % 3600
    mins, secs = (rem2 / 60).cast("long"), rem2 % 60
    return F.concat_ws(
        ", ",
        F.when(days > 0, F.format_string("%d days", days)),
        F.when(hours > 0, F.format_string("%d hours", hours)),
        F.when(mins > 0, F.format_string("%d minutes", mins)),
        F.when((secs > 0) | (c == 0), F.format_string("%d seconds", secs)),
    )


@chfn("bar")
def bar(x, lo, hi, width: int = 80) -> Column:
    """Unicode bar chart (bar.cpp) — full blocks only (eighth-blocks omitted)."""
    c = col(x).cast("double")
    frac = F.greatest(F.least((c - lo) / (hi - lo), F.lit(1.0)), F.lit(0.0))
    n = (frac * width).cast("int")
    return F.repeat(F.lit("█"), n)


@chfn("runningDifference")
def runningDifference(x, w: WindowSpec | None = None) -> Column:
    """x - lag(x) over the given window (0 for the first row)."""
    w = w or Window.orderBy(F.monotonically_increasing_id())
    c = col(x)
    return F.coalesce(c - F.lag(c).over(w), c * 0)


@chfn("neighbor")
def neighbor(x, offset: int, w: WindowSpec | None = None) -> Column:
    w = w or Window.orderBy(F.monotonically_increasing_id())
    c = col(x)
    if offset >= 0:
        return F.lead(c, offset).over(w)
    return F.lag(c, -offset).over(w)


@chfn("greatCircleDistance", "geoDistance")
def greatCircleDistance(lon1, lat1, lon2, lat2) -> Column:
    """Haversine in meters (greatCircleDistance.cpp uses the same sphere
    model, R=6371 km)."""
    rlat1, rlat2 = F.radians(col(lat1)), F.radians(col(lat2))
    dlat = rlat2 - rlat1
    dlon = F.radians(col(lon2)) - F.radians(col(lon1))
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    return 6371000.0 * 2 * F.asin(F.sqrt(a))


geoDistance = greatCircleDistance


# --- bitmap family (src/Functions/FunctionsBitmap.cpp) ----------------------
# ClickHouse bitmaps are roaring-bitmap values; the Spark-native carrier is a
# sorted distinct array<long> — every bitmap op is an array set-op in codegen.


@chfn("bitmapBuild")
def bitmapBuild(arr) -> Column:
    """bitmapBuild(array) → normalized bitmap (sorted distinct)."""
    return F.array_sort(F.array_distinct(col(arr)))


@chfn("bitmapToArray")
def bitmapToArray(bm) -> Column:
    return col(bm)


@chfn("bitmapCardinality")
def bitmapCardinality(bm) -> Column:
    return F.size(col(bm)).cast("long")


@chfn("bitmapAnd")
def bitmapAnd(a, b) -> Column:
    return F.array_sort(F.array_intersect(col(a), col(b)))


@chfn("bitmapOr")
def bitmapOr(a, b) -> Column:
    return F.array_sort(F.array_distinct(F.concat(col(a), col(b))))


@chfn("bitmapXor")
def bitmapXor(a, b) -> Column:
    union = F.array_distinct(F.concat(col(a), col(b)))
    inter = F.array_intersect(col(a), col(b))
    return F.array_sort(F.array_except(union, inter))


@chfn("bitmapAndnot")
def bitmapAndnot(a, b) -> Column:
    return F.array_sort(F.array_except(col(a), col(b)))


@chfn("bitmapContains")
def bitmapContains(bm, x) -> Column:
    return F.array_contains(col(bm), x)


@chfn("bitmapHasAny")
def bitmapHasAny(a, b) -> Column:
    return F.arrays_overlap(col(a), col(b))


@chfn("bitmapHasAll")
def bitmapHasAll(a, b) -> Column:
    """a ⊇ b."""
    return F.size(F.array_except(col(b), col(a))) == 0


@chfn("bitmapAndCardinality")
def bitmapAndCardinality(a, b) -> Column:
    return F.size(F.array_intersect(col(a), col(b))).cast("long")


@chfn("bitmapOrCardinality")
def bitmapOrCardinality(a, b) -> Column:
    return F.size(F.array_distinct(F.concat(col(a), col(b)))).cast("long")


# --- stem (src/Functions/FunctionsStemming? — reference: stem/lemmatize) ----


@chfn("stem")
def stem(word) -> Column:
    """Deterministic English suffix-stripper (Porter-lite): the reference's
    stem() is snowball-backed; this covers the common -ing/-edly/-s family
    identically enough for pipeline dedup/token-normalization use."""
    w = F.lower(col(word))
    return (
        F.when(w.rlike(".{4,}ingly$"), F.regexp_replace(w, "ingly$", ""))
        .when(w.rlike(".{3,}edly$"), F.regexp_replace(w, "edly$", ""))
        .when(w.rlike(".{4,}ing$"), F.regexp_replace(w, "ing$", ""))
        .when(w.rlike(".{3,}ied$"), F.regexp_replace(w, "ied$", "y"))
        .when(w.rlike(".{3,}ed$"), F.regexp_replace(w, "ed$", ""))
        .when(w.rlike(".{2,}ies$"), F.regexp_replace(w, "ies$", "y"))
        .when(w.rlike(".{3,}sses$"), F.regexp_replace(w, "es$", ""))
        .when(w.rlike(".{3,}s$") & ~w.rlike("ss$|us$|is$"), F.regexp_replace(w, "s$", ""))
        .otherwise(w)
    )


__all__ += [
    "bitmapBuild", "bitmapToArray", "bitmapCardinality", "bitmapAnd",
    "bitmapOr", "bitmapXor", "bitmapAndnot", "bitmapContains",
    "bitmapHasAny", "bitmapHasAll", "bitmapAndCardinality",
    "bitmapOrCardinality", "stem",
]
