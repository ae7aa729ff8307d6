"""parseDateTimeBestEffort — Python reimplementation of the reference
token scanner (src/IO/parseDateTimeBestEffort.cpp, Apache-2.0): digit
groups classified by length and neighborhood (13/10/9 digits = unix
timestamp, 14 = YYYYMMDDhhmmss, 8 = YYYYMMDD, 6 = YYYYMM or hhmmss,
4 = year with optional *MM*DD tail, 1-2 = hour/day/month depending on
the delimiter that follows), alphabetical month names / weekday names /
AM-PM / UTC-GMT-MSK-MSD words, ISO 'T'/'Z' separators, fractional
seconds after '.', and ±h[:mm] / ±hhmm timezone offsets. Returns the
UTC epoch plus the fractional part so DateTime and DateTime64 callers
share one scanner.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timezone

_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}
_WEEKDAYS = {"mon", "tue", "wed", "thu", "fri", "sat", "sun"}

_DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


class _In:
    __slots__ = ("s", "i")

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def check(self, c: str) -> bool:
        if self.peek() == c:
            self.i += 1
            return True
        return False

    def digits(self, maxn: int = 19) -> str:
        j = self.i
        while j < len(self.s) and j - self.i < maxn and self.s[j].isdigit():
            j += 1
        out = self.s[self.i : j]
        self.i = j
        return out

    def alpha(self, maxn: int) -> str:
        j = self.i
        while j < len(self.s) and j - self.i < maxn and self.s[j].isalpha() and self.s[j].isascii():
            j += 1
        out = self.s[self.i : j]
        self.i = j
        return out


def parse_best_effort(
    s: str, us_style: bool = False
) -> "tuple[int, int, int] | None":
    """(utc_epoch_seconds, fractional_digits, fractional_value) or None.
    Mirrors the conversion layer's isAllRead: trailing unconsumed input
    fails the parse (e.g. '1970010201:00:00' -> the 10-digit unix branch
    leaves ':00:00' -> NULL, reference 00569 vector)."""
    inn = _In(s.strip())
    r = _parse_core(inn, us_style)
    if r is None:
        return None
    if inn.s[inn.i:].strip():
        return None
    return r


def _parse_core(inn: "_In", us_style: bool) -> "tuple[int, int, int] | None":
    year = month = day = 0
    hour = minute = second = 0
    has_time = False
    frac_digits = 0
    frac_value = 0
    has_tz = False
    tz_neg = False
    tz_h = tz_m = 0
    is_am = is_pm = False
    has_comma_between = False

    while not inn.eof():
        if (year and not has_time) or (not year and has_time):
            if inn.peek() == ",":
                has_comma_between = True
                inn.i += 1

        num = ""
        if not year or not has_time:
            num = inn.digits()
            n = len(num)
            if n == 13 and not year and not has_time:
                return int(num[:10]), 3, int(num[10:]), True
            elif n == 10 and not year and not has_time:
                return int(num), 0, 0, True
            elif n == 9 and not year and not has_time:
                return int(num), 0, 0, True
            elif n == 14 and not year and not has_time:
                year, month, day = int(num[:4]), int(num[4:6]), int(num[6:8])
                hour, minute, second = int(num[8:10]), int(num[10:12]), int(num[12:14])
                has_time = True
            elif n == 8 and not year:
                year, month, day = int(num[:4]), int(num[4:6]), int(num[6:8])
            elif n == 6:
                if not year and not month:
                    year, month = int(num[:4]), int(num[4:6])
                elif not has_time:
                    hour, minute, second = int(num[:2]), int(num[2:4]), int(num[4:6])
                    has_time = True
                else:
                    return None
            elif n == 4 and not year:
                year = int(num)
                if not inn.eof():
                    delim = inn.peek()
                    if ord(delim) < 0x20 or delim in (",", ";", "'", '"'):
                        break
                    if month:
                        continue
                    inn.i += 1
                    num = inn.digits()
                    if len(num) in (1, 2):
                        month = int(num)
                    elif delim == " ":
                        continue
                    else:
                        return None
                    if not day and inn.check(delim):
                        num = inn.digits()
                        if len(num) in (1, 2):
                            day = int(num)
                        elif delim == " ":
                            continue
                        else:
                            return None
            elif n in (1, 2):
                v = int(num)
                if inn.check(":"):
                    if has_time:
                        return None
                    hour = v
                    has_time = True
                    num = inn.digits()
                    if len(num) in (1, 2):
                        minute = int(num)
                    else:
                        return None
                    if inn.check(":"):
                        num = inn.digits()
                        if len(num) in (1, 2):
                            second = int(num)
                        else:
                            return None
                elif inn.check(","):
                    if month and not day:
                        day = v
                elif inn.check("/") or inn.check(".") or inn.check("-"):
                    if day or month:
                        return None
                    if us_style:
                        month = v
                        num = inn.digits()
                        if len(num) in (1, 2):
                            day = int(num)
                        else:
                            return None
                    else:
                        day = v
                        num = inn.digits()
                        if len(num) in (1, 2):
                            month = int(num)
                        elif len(num) == 0:
                            al = inn.alpha(9)
                            if len(al) < 3:
                                return None
                            month = _MONTHS.get(al[:3].lower(), 0)
                            if not month:
                                return None
                        else:
                            return None
                    if month > 12:
                        month, day = day, month
                    if inn.check("/") or inn.check(".") or inn.check("-"):
                        if year:
                            return None
                        num = inn.digits()
                        if len(num) == 4:
                            year = int(num)
                        elif len(num) == 2:
                            year = int(num)
                            year += 1900 if year >= 70 else 2000
                        else:
                            return None
                else:
                    if day:
                        hour = v
                    else:
                        day = v
            elif n != 0:
                return None

        if not num:
            c = inn.peek()
            if c == " " or (c == "T" and year and not has_time):
                inn.i += 1
            elif c == "Z":
                inn.i += 1
                has_tz = True
            elif c == ".":
                if not has_time:
                    return None
                inn.i += 1
                fd = inn.digits()
                frac_digits = min(18, len(fd))
                frac_value = int(fd[:frac_digits]) if frac_digits else 0
            elif c in ("+", "-"):
                inn.i += 1
                num = inn.digits()
                n = len(num)
                if n == 6 and not has_time and year and month and day:
                    hour, minute, second = int(num[:2]), int(num[2:4]), int(num[4:6])
                    has_time = True
                else:
                    has_tz = True
                    tz_neg = c == "-"
                    # readDecimalNumber ACCUMULATES into the offset fields
                    # (res += digit*power), so 'MSK+0100' = 3h + 1h = UTC+4
                    if n == 4:
                        tz_h += int(num[:2])
                        tz_m += int(num[2:])
                    elif n == 3:
                        tz_h += int(num[:1])
                        tz_m += int(num[1:])
                    elif n in (1, 2):
                        tz_h += int(num)
                    else:
                        return None
                    if n < 3 and inn.check(":"):
                        num = inn.digits()
                        if len(num) in (1, 2):
                            tz_m += int(num)
                        else:
                            return None
            else:
                al = inn.alpha(3)
                if not al:
                    break
                if len(al) == 1:
                    return None
                if len(al) == 2:
                    if al[1] in "Mm":
                        if al[0] in "Aa":
                            is_am = True
                        elif al[0] in "Pp":
                            is_pm = True
                        else:
                            return None
                    else:
                        return None
                else:
                    a3 = al.lower()
                    has_dow = False
                    if a3 in _MONTHS:
                        month = _MONTHS[a3]
                    elif a3 == "utc" or a3 == "gmt":
                        has_tz = True
                    elif a3 == "msk":
                        has_tz = True
                        tz_h = 3
                    elif a3 == "msd":
                        has_tz = True
                        tz_h = 4
                    elif a3 in _WEEKDAYS:
                        has_dow = True
                    else:
                        return None
                    while not inn.eof() and inn.peek().isalpha() and inn.peek().isascii():
                        inn.i += 1
                    if has_dow:
                        inn.check(",")

    if has_comma_between and (not has_time or not year or not month or not day):
        return None
    if not year and not month and not day and not has_time:
        return None
    if not year:
        year = 2000
    if not month:
        month = 1
    if not day:
        day = 1

    leap = (year % 400 == 0) or (year % 100 != 0 and year % 4 == 0)
    dim = _DAYS_IN_MONTH[month - 1] + (1 if (leap and month == 2) else 0) if 1 <= month <= 12 else 0
    if not (1 <= month <= 12 and 1 <= day <= dim):
        return None

    if is_am and hour == 12:
        hour = 0
    if is_pm and hour < 12:
        hour += 12
    if hour > 23 or minute > 59 or second > 59:
        return None

    try:
        epoch = calendar.timegm((year, month, day, hour, minute, second, 0, 0, 0))
    except (ValueError, OverflowError):
        return None
    if has_tz:
        epoch += (tz_h * 3600 + tz_m * 60) * (1 if tz_neg else -1)
    return epoch, frac_digits, frac_value, has_tz


def parse_best_effort_tz(
    s, tz_name: str | None = None, us_style: bool = False
) -> "tuple[int, int, int] | None":
    """Like parse_best_effort, interpreting offset-less wall-clock inputs
    in tz_name (the reference's local_time_zone). Absolute inputs (unix
    timestamps, explicit offsets/Z/GMT) are never shifted."""
    if s is None:
        return None
    r = parse_best_effort(str(s), us_style)
    if r is None:
        return None
    epoch, fd, fv, is_absolute = r
    if not is_absolute and tz_name and tz_name.upper() != "UTC":
        try:
            from zoneinfo import ZoneInfo

            z = ZoneInfo(tz_name)
            naive = datetime.fromtimestamp(epoch, tz=timezone.utc).replace(tzinfo=None)
            epoch = int(naive.replace(tzinfo=z).timestamp())
        except Exception:  # noqa: BLE001 — unknown zone: keep UTC
            pass
    return epoch, fd, fv
