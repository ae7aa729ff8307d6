"""Type-conversion family.

Reference: src/Functions/FunctionsConversion.cpp:8 (12k LoC): toUInt*/toInt*/
toFloat*/toString/toDate/toDateTime/CAST/accurateCast/parseDateTimeBestEffort.

UInt64 maps to LongType (Spark has no unsigned; SURVEY §1.2 caveat).
`toString` follows ClickHouse formatting for dates (ISO) — Spark's cast
produces the same ISO forms.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions.registry import chfn, col

__all__ = [
    "toUInt8", "toUInt16", "toUInt32", "toUInt64", "toInt8", "toInt16",
    "toInt32", "toInt64", "toFloat32", "toFloat64", "toString", "toDate",
    "toDate32", "toDateTime", "toDateTime64", "toDecimal", "toDecimal32",
    "toDecimal64", "toDecimal128", "toUnixTimestamp", "fromUnixTimestamp",
    "toFixedString", "parseDateTimeBestEffort", "parseDateTime",
    "formatDateTime", "cast_", "accurateCast", "accurateCastOrNull",
    "toIntervalSecond", "toIntervalMinute", "toIntervalHour", "toIntervalDay",
    "toIntervalWeek", "toIntervalMonth", "toIntervalYear", "toTypeName",
]


@chfn("toUInt8")
def toUInt8(x) -> Column:
    return F.pmod(col(x).cast("long"), F.lit(256)).cast("int")


@chfn("toUInt16")
def toUInt16(x) -> Column:
    return F.pmod(col(x).cast("long"), F.lit(65536)).cast("int")


@chfn("toUInt32")
def toUInt32(x) -> Column:
    return F.pmod(col(x).cast("long"), F.lit(4294967296)).cast("long")


@chfn("toUInt64")
def toUInt64(x) -> Column:
    return col(x).cast("long")


@chfn("toInt8")
def toInt8(x) -> Column:
    return col(x).cast("tinyint")


@chfn("toInt16")
def toInt16(x) -> Column:
    return col(x).cast("smallint")


@chfn("toInt32")
def toInt32(x) -> Column:
    return col(x).cast("int")


@chfn("toInt64")
def toInt64(x) -> Column:
    return col(x).cast("long")


@chfn("toFloat32")
def toFloat32(x) -> Column:
    return col(x).cast("float")


@chfn("toFloat64")
def toFloat64(x) -> Column:
    return col(x).cast("double")


@chfn("toString")
def toString(x) -> Column:
    return col(x).cast("string")


@chfn("toDate", "DATE")
def toDate(x) -> Column:
    return col(x).cast("date")


@chfn("toDate32")
def toDate32(x) -> Column:
    return col(x).cast("date")


@chfn("toDateTime")
def toDateTime(x) -> Column:
    """Strings parse as ISO; numerics are unix seconds (ClickHouse rule)."""
    c = col(x)
    return c.cast("timestamp")


@chfn("toDateTime64")
def toDateTime64(x, scale: int = 3) -> Column:
    return col(x).cast("timestamp")


@chfn("toDecimal", "toDecimal128")
def toDecimal(x, scale: int = 10) -> Column:
    return col(x).cast(f"decimal(38,{scale})")


@chfn("toDecimal32")
def toDecimal32(x, scale: int = 4) -> Column:
    return col(x).cast(f"decimal(9,{scale})")


@chfn("toDecimal64")
def toDecimal64(x, scale: int = 6) -> Column:
    return col(x).cast(f"decimal(18,{scale})")


toDecimal128 = toDecimal


@chfn("toUnixTimestamp")
def toUnixTimestamp(x) -> Column:
    return F.unix_timestamp(col(x).cast("timestamp")).cast("long")


@chfn("fromUnixTimestamp", "FROM_UNIXTIME")
def fromUnixTimestamp(x, fmt: str | None = None) -> Column:
    ts = F.timestamp_seconds(col(x).cast("long"))
    return F.date_format(ts, _ch_to_spark_datetime_format(fmt)) if fmt else ts


@chfn("toFixedString")
def toFixedString(x, n: int) -> Column:
    return F.rpad(col(x).cast("string"), n, "\x00")


# ClickHouse formatDateTime syntax (src/Functions/formatDateTime.cpp:1689)
# uses MySQL-style %-codes; Spark uses Java DateTimeFormatter patterns.
_CH_FMT = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%c": "M", "%d": "dd", "%e": "d",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss", "%p": "a", "%j": "DDD",
    "%a": "EEE", "%W": "EEEE", "%w": "F", "%F": "yyyy-MM-dd", "%D": "MM/dd/yy",
    "%T": "HH:mm:ss", "%R": "HH:mm", "%n": "\n", "%t": "\t", "%%": "%",
    "%Q": "Q", "%G": "YYYY", "%g": "YY", "%f": "SSSSSS",
}


def _ch_to_spark_datetime_format(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i : i + 2]
            out.append(_CH_FMT.get(code, code))
            i += 2
        else:
            # literal chars that are pattern letters in Java need quoting
            ch = fmt[i]
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


@chfn("formatDateTime", "DATE_FORMAT")
def formatDateTime(x, fmt: str) -> Column:
    if "%C" in fmt:
        # century, zero-padded (formatDateTime.cpp %C = year/100)
        cent = F.lpad(
            F.floor(F.year(col(x)) / 100).cast("int").cast("string"), 2, "0"
        )
        parts = fmt.split("%C")
        cols: list[Column] = []
        for i, p in enumerate(parts):
            if p:
                cols.append(
                    F.date_format(col(x), _ch_to_spark_datetime_format(p))
                )
            if i + 1 < len(parts):
                cols.append(cent)
        return F.concat(*cols) if cols else F.lit("")
    return F.date_format(col(x), _ch_to_spark_datetime_format(fmt))


@chfn("parseDateTime")
def parseDateTime(x, fmt: str) -> Column:
    return F.to_timestamp(col(x), _ch_to_spark_datetime_format(fmt))


@chfn("parseDateTimeBestEffort", "parseDateTimeBestEffortOrNull")
def parseDateTimeBestEffort(x, tz: str | None = None) -> Column:
    """Best-effort: try common formats in order, first non-null wins.
    With a timezone argument, naive strings are wall times IN that zone and
    the result renders as wall time in the same zone (identity), while
    offset-bearing strings resolve to an instant and convert into the zone
    (parseDateTimeBestEffort.cpp's DateTime(tz) return type)."""
    c = col(x)
    naive = F.coalesce(
        F.to_timestamp(c, "yyyy-MM-dd HH:mm:ss"),
        F.to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss"),
        F.to_timestamp(c, "yyyy-MM-dd"),
        F.to_timestamp(c, "dd/MM/yyyy HH:mm:ss"),
        F.to_timestamp(c, "yyyyMMddHHmmss"),
        F.to_timestamp(c, "yyyyMMdd"),
    )
    if tz is None:
        return F.coalesce(naive, c.cast("timestamp"))
    return F.coalesce(
        naive, F.from_utc_timestamp(c.cast("timestamp"), str(tz))
    )


@chfn("CAST", "cast")
def cast_(x, to_type: str) -> Column:
    return col(x).cast(_ch_type_to_spark(to_type))


@chfn("accurateCast")
def accurateCast(x, to_type: str) -> Column:
    return col(x).cast(_ch_type_to_spark(to_type))


@chfn("accurateCastOrNull")
def accurateCastOrNull(x, to_type: str) -> Column:
    return col(x).try_cast(_ch_type_to_spark(to_type))


_CH_TYPES = {
    "uint8": "int", "uint16": "int", "uint32": "long", "uint64": "long",
    "int8": "tinyint", "int16": "smallint", "int32": "int", "int64": "long",
    "float32": "float", "float64": "double", "string": "string",
    "date": "date", "date32": "date", "datetime": "timestamp",
    "datetime64": "timestamp", "uuid": "string", "bool": "boolean",
}


def _ch_type_to_spark(t: str) -> str:
    return _CH_TYPES.get(t.strip().lower(), t)


@chfn("toIntervalSecond")
def toIntervalSecond(n) -> Column:
    return F.make_dt_interval(secs=col(n))


@chfn("toIntervalMinute")
def toIntervalMinute(n) -> Column:
    return F.make_dt_interval(mins=col(n))


@chfn("toIntervalHour")
def toIntervalHour(n) -> Column:
    return F.make_dt_interval(hours=col(n))


@chfn("toIntervalDay")
def toIntervalDay(n) -> Column:
    return F.make_dt_interval(days=col(n))


@chfn("toIntervalWeek")
def toIntervalWeek(n) -> Column:
    return F.make_dt_interval(days=col(n) * 7)


@chfn("toIntervalMonth")
def toIntervalMonth(n) -> Column:
    return F.make_ym_interval(months=col(n))


@chfn("toIntervalYear")
def toIntervalYear(n) -> Column:
    return F.make_ym_interval(years=col(n))


@chfn("toTypeName")
def toTypeName(x) -> Column:
    return F.typeof(col(x))
