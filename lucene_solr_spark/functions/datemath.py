"""Solr date-math parser (solr/util/DateMathParser.java).

Grammar: a base instant — ``NOW`` or an ISO-8601 instant — followed by
any sequence of operations:

    /UNIT      round DOWN to the unit           (NOW/DAY)
    +N UNIT    add N units                      (NOW+6MONTHS)
    -N UNIT    subtract N units                 (NOW/DAY-7DAYS)

Units (case-insensitive, optional plural, per DateMathParser's
CALENDAR_UNITS): YEAR, MONTH, DAY/DATE, HOUR, MINUTE/MIN, SECOND/SEC,
MILLI/MILLISECOND. Month arithmetic clamps the day-of-month like
java.util.Calendar (Jan 31 + 1MONTH = Feb 28/29).

All arithmetic is timezone-naive UTC by default (Solr's default
TZ=UTC), so the resolved instants are deterministic given the base —
which is what the TimeSeries/range-facet entries need for
oracle-checkable windows.

``tz=`` renders Solr's TZ request param: DateMathParser.java:364-420
converts the instant to a LocalDateTime in that zone, applies EVERY
op as wall-clock arithmetic there (so ``/DAY`` rounds to the zone's
midnight, ``+1DAY`` across a DST change keeps the wall time), then
re-localizes — ports here as aware-UTC → zone wall time →
the same ``_add``/``_round_down`` (already wall-clock) → zone →
UTC. Ambiguous/nonexistent wall times resolve like
``LocalDateTime.atZone`` (earlier offset / shifted forward), which is
Python ``ZoneInfo``'s fold=0 behavior.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

_UNIT_RE = re.compile(
    r"(YEARS?|MONTHS?|DAYS?|DATE|HOURS?|MINUTES?|MINS?|SECONDS?|SECS?"
    r"|MILLISECONDS?|MILLIS?)",
    re.IGNORECASE,
)
_OP_RE = re.compile(
    rf"(/|\+|-)(\d+)?{_UNIT_RE.pattern}", re.IGNORECASE)

_CANON = {
    "YEAR": "YEAR", "MONTH": "MONTH", "DAY": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "MINUTE": "MINUTE", "MIN": "MINUTE",
    "SECOND": "SECOND", "SEC": "SECOND",
    "MILLISECOND": "MILLI", "MILLI": "MILLI",
}


def _canon_unit(u: str) -> str:
    u = u.upper()
    if u.endswith("S") and u not in ("MILLIS",):
        u = u[:-1]
    if u == "MILLIS":
        u = "MILLI"
    return _CANON[u]


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "MONTH":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return dt.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return dt.replace(microsecond=0)
    if unit == "MILLI":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise ValueError(unit)


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "YEAR":
        return _add(dt, 12 * n, "MONTH")
    if unit == "MONTH":
        m = dt.month - 1 + n
        year = dt.year + m // 12
        month = m % 12 + 1
        day = min(dt.day, calendar.monthrange(year, month)[1])
        return dt.replace(year=year, month=month, day=day)
    delta = {"DAY": timedelta(days=n), "HOUR": timedelta(hours=n),
             "MINUTE": timedelta(minutes=n), "SECOND": timedelta(seconds=n),
             "MILLI": timedelta(milliseconds=n)}[unit]
    return dt + delta


def parse_date_math(expr: str, now: datetime | None = None,
                    tz: str | None = None) -> datetime:
    """Resolve a date-math expression to a (naive-UTC) datetime.

    ``tz`` is an IANA zone name (Solr's TZ param); rounding and
    calendar adds then use that zone's wall clock."""
    expr = expr.strip()
    if expr.upper().startswith("NOW"):
        base = now if now is not None else datetime.utcnow()
        rest = expr[3:]
    else:
        m = re.match(r"([0-9T:\.\-]+Z?)", expr)
        if not m:
            raise ValueError(f"bad date math base in {expr!r}")
        iso = m.group(1).rstrip("Z")
        try:
            base = datetime.fromisoformat(iso)
        except ValueError as e:
            raise ValueError(f"bad date math base in {expr!r}") from e
        rest = expr[m.end():]

    zone = None
    if tz is not None and tz.upper() != "UTC":
        from datetime import timezone as _tzutc
        from zoneinfo import ZoneInfo

        zone = ZoneInfo(tz)
        # instant → the zone's wall clock (LocalDateTime in the TZ)
        base = (base.replace(tzinfo=_tzutc.utc).astimezone(zone)
                .replace(tzinfo=None))

    pos = 0
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if not m:
            raise ValueError(f"bad date math op at {rest[pos:]!r}")
        op, n, unit = m.group(1), m.group(2), _canon_unit(m.group(3))
        if op == "/":
            if n:
                raise ValueError("rounding takes no count")
            base = _round_down(base, unit)
        else:
            if not n:
                raise ValueError(f"{op}{unit} needs a count")
            base = _add(base, int(n) if op == "+" else -int(n), unit)
        pos = m.end()
    if zone is not None:
        from datetime import timezone as _tzutc

        # wall time → instant (LocalDateTime.atZone, fold=0) → UTC
        base = (base.replace(tzinfo=zone).astimezone(_tzutc.utc)
                .replace(tzinfo=None))
    return base
