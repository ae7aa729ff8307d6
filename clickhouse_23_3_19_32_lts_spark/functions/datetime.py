"""Date/time family (the densest ClickHouse surface).

Reference: src/Functions/toStartOfInterval.cpp:535, dateDiff.cpp:448,
DateTimeTransforms.h (toYear..toSecond, toStartOf*), addDays etc. via
FunctionDateOrDateTimeAddInterval, toYYYYMM.cpp, timeSlot, now.cpp.

Time zone: engine runs with spark.sql.session.timeZone=UTC; ClickHouse tz
arguments are accepted but only 'UTC' is honored (documented divergence —
add from_utc_timestamp wrappers if a test demands a named zone).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.functions.registry import chfn, col

__all__ = [
    "toYear", "toQuarter", "toMonth", "toDayOfYear", "toDayOfMonth",
    "toDayOfWeek", "toHour", "toMinute", "toSecond", "toMonday",
    "toStartOfYear", "toStartOfQuarter", "toStartOfMonth", "toStartOfWeek",
    "toStartOfDay", "toStartOfHour", "toStartOfMinute", "toStartOfSecond",
    "toStartOfFiveMinutes", "toStartOfTenMinutes", "toStartOfFifteenMinutes",
    "toStartOfInterval", "toLastDayOfMonth", "toTime", "toYYYYMM",
    "toYYYYMMDD", "toYYYYMMDDhhmmss", "toWeek", "toISOWeek", "toISOYear",
    "addYears", "addMonths", "addWeeks", "addDays", "addHours", "addMinutes",
    "addSeconds", "subtractYears", "subtractMonths", "subtractWeeks",
    "subtractDays", "subtractHours", "subtractMinutes", "subtractSeconds",
    "dateDiff", "dateAdd", "dateSub", "dateName", "dateTrunc", "age",
    "now", "today", "yesterday", "timeSlot", "timeSlots",
    "toRelativeYearNum", "toRelativeMonthNum", "toRelativeDayNum",
    "toRelativeHourNum", "toRelativeMinuteNum", "toRelativeSecondNum",
    "monthName", "toModifiedJulianDay", "fromModifiedJulianDay",
    "makeDate", "makeDateTime",
]


@chfn("toYear", "YEAR")
def toYear(x) -> Column:
    return F.year(col(x))


@chfn("toQuarter", "QUARTER")
def toQuarter(x) -> Column:
    return F.quarter(col(x))


@chfn("toMonth", "MONTH")
def toMonth(x) -> Column:
    return F.month(col(x))


@chfn("toDayOfYear", "DAYOFYEAR")
def toDayOfYear(x) -> Column:
    return F.dayofyear(col(x))


@chfn("toDayOfMonth", "DAYOFMONTH", "DAY")
def toDayOfMonth(x) -> Column:
    return F.dayofmonth(col(x))


@chfn("toDayOfWeek", "DAYOFWEEK")
def toDayOfWeek(x) -> Column:
    """ClickHouse: Monday=1..Sunday=7 (ISO). Spark dayofweek: Sunday=1."""
    return F.weekday(col(x)) + 1


@chfn("toHour", "HOUR")
def toHour(x) -> Column:
    return F.hour(col(x))


@chfn("toMinute", "MINUTE")
def toMinute(x) -> Column:
    return F.minute(col(x))


@chfn("toSecond", "SECOND")
def toSecond(x) -> Column:
    return F.second(col(x))


@chfn("toMonday")
def toMonday(x) -> Column:
    return F.date_trunc("week", col(x)).cast("date")


@chfn("toStartOfYear")
def toStartOfYear(x) -> Column:
    return F.date_trunc("year", col(x)).cast("date")


@chfn("toStartOfQuarter")
def toStartOfQuarter(x) -> Column:
    return F.date_trunc("quarter", col(x)).cast("date")


@chfn("toStartOfMonth")
def toStartOfMonth(x) -> Column:
    return F.date_trunc("month", col(x)).cast("date")


@chfn("toStartOfWeek")
def toStartOfWeek(x, mode: int = 0) -> Column:
    """mode 0: week starts Sunday (ClickHouse default); mode 1: Monday."""
    if mode == 1:
        return F.date_trunc("week", col(x)).cast("date")
    # next_day is strictly-after, so next_day(d,'Sun')-7 maps a Sunday to itself
    return F.date_sub(F.next_day(col(x).cast("date"), "Sun"), 7)


@chfn("toStartOfDay")
def toStartOfDay(x) -> Column:
    return F.date_trunc("day", col(x))


@chfn("toStartOfHour")
def toStartOfHour(x) -> Column:
    return F.date_trunc("hour", col(x))


@chfn("toStartOfMinute")
def toStartOfMinute(x) -> Column:
    return F.date_trunc("minute", col(x))


@chfn("toStartOfSecond")
def toStartOfSecond(x) -> Column:
    return F.date_trunc("second", col(x))


def _start_of_n_minutes(x, n: int) -> Column:
    secs = F.unix_timestamp(col(x))
    return F.timestamp_seconds((secs - secs % (n * 60)))


@chfn("toStartOfFiveMinutes")
def toStartOfFiveMinutes(x) -> Column:
    return _start_of_n_minutes(x, 5)


@chfn("toStartOfTenMinutes")
def toStartOfTenMinutes(x) -> Column:
    return _start_of_n_minutes(x, 10)


@chfn("toStartOfFifteenMinutes")
def toStartOfFifteenMinutes(x) -> Column:
    return _start_of_n_minutes(x, 15)


_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


@chfn("toStartOfInterval")
def toStartOfInterval(x, n: int, unit: str) -> Column:
    """toStartOfInterval(ts, INTERVAL n unit) (toStartOfInterval.cpp:535).

    Sub-month units: epoch arithmetic. Month/quarter/year: month arithmetic
    anchored at 1970-01-01.
    """
    unit = unit.lower().rstrip("s")
    c = col(x)
    if unit in _UNIT_SECONDS:
        step = n * _UNIT_SECONDS[unit]
        secs = F.unix_timestamp(c)
        return F.timestamp_seconds(secs - F.pmod(secs, F.lit(step)))
    if unit in ("month", "quarter", "year"):
        months_per = {"month": 1, "quarter": 3, "year": 12}[unit] * n
        m = (F.year(c) - 1970) * 12 + F.month(c) - 1
        start = m - F.pmod(m, F.lit(months_per))
        return F.add_months(F.lit("1970-01-01").cast("date"), start)
    raise ValueError(f"unsupported interval unit {unit}")


@chfn("toLastDayOfMonth")
def toLastDayOfMonth(x) -> Column:
    return F.last_day(col(x))


@chfn("toTime")
def toTime(x) -> Column:
    """Keep time-of-day, date pinned to 1970-01-02 (ClickHouse convention)."""
    c = col(x)
    return F.timestamp_seconds(
        86400 + F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)
    )


@chfn("toYYYYMM")
def toYYYYMM(x) -> Column:
    return (F.year(col(x)) * 100 + F.month(col(x))).cast("long")


@chfn("toYYYYMMDD")
def toYYYYMMDD(x) -> Column:
    c = col(x)
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("long")


@chfn("toYYYYMMDDhhmmss")
def toYYYYMMDDhhmmss(x) -> Column:
    c = col(x)
    return (
        F.year(c).cast("long") * 10000000000
        + F.month(c) * 100000000
        + F.dayofmonth(c) * 1000000
        + F.hour(c) * 10000
        + F.minute(c) * 100
        + F.second(c)
    )


@chfn("toWeek", "WEEK")
def toWeek(x, mode: int = 0) -> Column:
    return F.weekofyear(col(x))


@chfn("toISOWeek")
def toISOWeek(x) -> Column:
    return F.weekofyear(col(x))


@chfn("toISOYear")
def toISOYear(x) -> Column:
    return F.year(F.date_add(col(x).cast("date"), 4 - (F.weekday(col(x)) + 1)))


@chfn("addYears")
def addYears(x, n) -> Column:
    return F.add_months(col(x), (col(n) if isinstance(n, Column) else F.lit(n)) * 12)


@chfn("addMonths")
def addMonths(x, n) -> Column:
    return F.add_months(col(x), col(n) if isinstance(n, Column) else F.lit(n))


@chfn("addWeeks")
def addWeeks(x, n) -> Column:
    return F.date_add(col(x), (col(n) if isinstance(n, Column) else F.lit(n)) * 7)


@chfn("addDays")
def addDays(x, n) -> Column:
    """Timestamp-preserving (our tables store timestamps; ClickHouse keeps
    the argument type — cast to date at the call site when needed)."""
    nn = col(n) if isinstance(n, Column) else F.lit(n)
    return F.timestamp_seconds(F.unix_timestamp(col(x)) + nn * 86400)


@chfn("addHours")
def addHours(x, n) -> Column:
    nn = col(n) if isinstance(n, Column) else F.lit(n)
    return F.timestamp_seconds(F.unix_timestamp(col(x)) + nn * 3600)


@chfn("addMinutes")
def addMinutes(x, n) -> Column:
    nn = col(n) if isinstance(n, Column) else F.lit(n)
    return F.timestamp_seconds(F.unix_timestamp(col(x)) + nn * 60)


@chfn("addSeconds")
def addSeconds(x, n) -> Column:
    nn = col(n) if isinstance(n, Column) else F.lit(n)
    return F.timestamp_seconds(F.unix_timestamp(col(x)) + nn)


@chfn("subtractYears")
def subtractYears(x, n) -> Column:
    return addYears(x, -(col(n) if isinstance(n, Column) else F.lit(n)))


@chfn("subtractMonths")
def subtractMonths(x, n) -> Column:
    return addMonths(x, -(col(n) if isinstance(n, Column) else F.lit(n)))


@chfn("subtractWeeks")
def subtractWeeks(x, n) -> Column:
    return addWeeks(x, -(col(n) if isinstance(n, Column) else F.lit(n)))


@chfn("subtractDays")
def subtractDays(x, n) -> Column:
    return addDays(x, -(col(n) if isinstance(n, Column) else F.lit(n)))


@chfn("subtractHours")
def subtractHours(x, n) -> Column:
    return addHours(x, -(col(n) if isinstance(n, Column) else F.lit(n)))


@chfn("subtractMinutes")
def subtractMinutes(x, n) -> Column:
    return addMinutes(x, -(col(n) if isinstance(n, Column) else F.lit(n)))


@chfn("subtractSeconds")
def subtractSeconds(x, n) -> Column:
    return addSeconds(x, -(col(n) if isinstance(n, Column) else F.lit(n)))


_DIFF_UNITS = {
    "second": "second", "minute": "minute", "hour": "hour", "day": "day",
    "week": "week", "month": "month", "quarter": "quarter", "year": "year",
}


@chfn("dateDiff", "date_diff", "DATE_DIFF", "timestampDiff", "TIMESTAMP_DIFF")
def dateDiff(unit: str, start, end) -> Column:
    """dateDiff('unit', start, end) (dateDiff.cpp:448) — whole-unit boundary
    crossings, like Spark's timestampdiff for sub-month units."""
    u = _DIFF_UNITS[unit.lower().rstrip("s")]
    return F.timestamp_diff(u, col(start).cast("timestamp"), col(end).cast("timestamp")).cast("long")


@chfn("dateAdd", "DATE_ADD", "timestampAdd", "TIMESTAMP_ADD")
def dateAdd(unit: str, n, x) -> Column:
    u = unit.lower().rstrip("s")
    dispatch = {
        "year": addYears, "month": addMonths, "week": addWeeks, "day": addDays,
        "hour": addHours, "minute": addMinutes, "second": addSeconds,
    }
    return dispatch[u](x, n)


@chfn("dateSub", "DATE_SUB", "timestampSub", "TIMESTAMP_SUB")
def dateSub(unit: str, n, x) -> Column:
    nn = col(n) if isinstance(n, Column) else F.lit(n)
    return dateAdd(unit, -nn, x)


@chfn("dateName")
def dateName(part: str, x) -> Column:
    p = part.lower()
    if p == "month":
        return F.date_format(col(x), "MMMM")
    if p in ("weekday", "dayofweek"):
        return F.date_format(col(x), "EEEE")
    if p == "year":
        return F.year(col(x)).cast("string")
    if p == "day":
        return F.dayofmonth(col(x)).cast("string")
    raise ValueError(f"dateName part {part}")


@chfn("dateTrunc", "date_trunc", "DATE_TRUNC")
def dateTrunc(unit: str, x) -> Column:
    return F.date_trunc(unit.lower(), col(x))


@chfn("age")
def age(unit: str, start, end) -> Column:
    """Like dateDiff but counts *complete* units (23.3 age())."""
    u = unit.lower().rstrip("s")
    if u in ("second", "minute", "hour", "day", "week"):
        secs = F.unix_timestamp(col(end)) - F.unix_timestamp(col(start))
        per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}[u]
        return F.floor(secs / per).cast("long")
    months = F.months_between(col(end), col(start))
    if u == "month":
        return F.floor(months).cast("long")
    if u == "quarter":
        return F.floor(months / 3).cast("long")
    if u == "year":
        return F.floor(months / 12).cast("long")
    raise ValueError(f"age unit {unit}")


@chfn("now")
def now() -> Column:
    return F.current_timestamp()


@chfn("today")
def today() -> Column:
    return F.current_date()


@chfn("yesterday")
def yesterday() -> Column:
    return F.date_sub(F.current_date(), 1)


@chfn("timeSlot")
def timeSlot(x) -> Column:
    return _start_of_n_minutes(x, 30)


@chfn("timeSlots")
def timeSlots(start, duration, slot: int = 1800) -> Column:
    """Array of 30-min slot starts covering [start, start+duration]."""
    s = F.unix_timestamp(col(start))
    d = col(duration) if isinstance(duration, Column) else F.lit(duration)
    first = s - F.pmod(s, F.lit(slot))
    last = (s + d) - F.pmod(s + d, F.lit(slot))
    return F.transform(
        F.sequence(first, last, F.lit(slot)), lambda t: F.timestamp_seconds(t)
    )


@chfn("toRelativeYearNum")
def toRelativeYearNum(x) -> Column:
    return F.year(col(x)).cast("long")


@chfn("toRelativeMonthNum")
def toRelativeMonthNum(x) -> Column:
    return (F.year(col(x)) * 12 + F.month(col(x))).cast("long")


@chfn("toRelativeDayNum")
def toRelativeDayNum(x) -> Column:
    return F.datediff(col(x).cast("date"), F.lit("1970-01-01").cast("date")).cast("long")


@chfn("toRelativeHourNum")
def toRelativeHourNum(x) -> Column:
    return F.floor(F.unix_timestamp(col(x)) / 3600).cast("long")


@chfn("toRelativeMinuteNum")
def toRelativeMinuteNum(x) -> Column:
    return F.floor(F.unix_timestamp(col(x)) / 60).cast("long")


@chfn("toRelativeSecondNum")
def toRelativeSecondNum(x) -> Column:
    return F.unix_timestamp(col(x)).cast("long")


@chfn("monthName")
def monthName(x) -> Column:
    return F.date_format(col(x), "MMMM")


@chfn("toModifiedJulianDay")
def toModifiedJulianDay(x) -> Column:
    # MJD 0 = 1858-11-17
    return F.datediff(col(x).cast("date"), F.lit("1858-11-17").cast("date")).cast("long")


@chfn("fromModifiedJulianDay")
def fromModifiedJulianDay(n) -> Column:
    return F.date_add(F.lit("1858-11-17").cast("date"), col(n).cast("int"))


@chfn("makeDate")
def makeDate(y, m, d) -> Column:
    return F.make_date(col(y), col(m), col(d))


@chfn("makeDateTime")
def makeDateTime(y, mo, d, h, mi, s) -> Column:
    return F.make_timestamp(col(y), col(mo), col(d), col(h), col(mi), col(s))
