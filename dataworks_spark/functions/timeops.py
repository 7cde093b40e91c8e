"""Time handling — a column-level port of the reference's polymorphic
`consume-time` parser (src/dataworks/utils/time.clj:11-86), SURVEY §2 H3.

The reference accepts instants, dates (promoted to midnight),
durations/periods (relative to now), a day-of-week (next such day), an
int (millis offset from now), unit keywords (:millis…:years → now + 1
unit, truncated), and the :never sentinel. All of that maps onto
JVM-side Spark expressions — no UDF."""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

#: far-future sentinel standing in for the reference's :never
#: (utils/time.clj:75) — used as the open end of validity intervals.
#: Chosen inside pandas' ns-timestamp range (max 2262-04-11) so results
#: surfacing an open interval survive Arrow/toPandas collection; the
#: reference's MAX_INSTANT equivalent would overflow there.
NEVER = _dt.datetime(2261, 12, 31, 0, 0, 0)

_UNITS = {
    "millis": "millisecond",
    "seconds": "second",
    "minutes": "minute",
    "hours": "hour",
    "days": "day",
    "weeks": "week",
    "months": "month",
    "years": "year",
}


def consume_time(value) -> Column:
    """Turn any reference-accepted time literal into a TimestampType
    Column (utils/time.clj:11-86 case analysis)."""
    # Column FIRST: `value == ':never'` on a Column builds a comparison
    # Column, and `or` would force bool(Column) → PySparkValueError —
    # the documented Column branch was unreachable (r10 review)
    if isinstance(value, Column):
        return value.cast("timestamp")
    if value is None or value == ":never":
        return F.lit(NEVER).cast("timestamp")
    if isinstance(value, _dt.datetime):
        return F.lit(value).cast("timestamp")
    if isinstance(value, _dt.date):
        # date → midnight instant (time.clj:61-64)
        return F.lit(_dt.datetime(value.year, value.month, value.day)).cast("timestamp")
    if isinstance(value, _dt.timedelta):
        # duration → now + d (time.clj:66-68)
        return F.current_timestamp() + F.make_dt_interval(
            F.lit(value.days), F.lit(0), F.lit(0), F.lit(value.seconds + value.microseconds / 1e6)
        )
    if isinstance(value, int):
        # int = millis offset from now (time.clj:74)
        return F.current_timestamp() + F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0), F.lit(value / 1000.0)
        )
    if isinstance(value, str):
        if value.startswith(":"):
            unit = _UNITS.get(value[1:])
            if unit:  # :unit → now + 1 unit, truncated (time.clj:76-86)
                base = F.current_timestamp() + F.expr(f"INTERVAL 1 {unit.upper()}")
                return F.date_trunc(unit, base)
            raise ValueError(f"unknown time keyword {value}")
        if value.lower() in {"monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday"}:
            # day-of-week → next such day at midnight (time.clj:70-73)
            return F.next_day(F.current_date(), value[:3].capitalize()).cast("timestamp")
        return F.to_timestamp(F.lit(value))
    raise TypeError(f"cannot consume time from {type(value)}")


def millis_between(a: Column, b: Column) -> Column:
    """Reference millis arithmetic (utils/time.clj:88-94)."""
    return F.unix_millis(b) - F.unix_millis(a)
