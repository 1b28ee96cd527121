"""Partition parsing and freshness validation.

Re-expresses reference options/JdbcExportArgsFactory.java:
- `parse_instant` accepts the same lenient `yyyy[-MM][-dd['T'HH[:mm[:ss]]]]`
  shapes (plus an optional offset), defaulting missing parts;
- `parse_period` maps --partitionPeriod strings to calendar periods or
  sub-daily timedeltas;
- `validate_partition` fails exports aimed at partitions older than
  `min_partition` (default now - 2×period), unless skipped — the
  guard that keeps new data out of old partitions.
"""

from __future__ import annotations

import re
from datetime import date, datetime, timedelta, timezone

from dbeam_spark.errors import NotReadyError
from dbeam_spark.query_builder import _leap

_INSTANT_RE = re.compile(
    r"^(\d{4})(?:-(\d{2}))?(?:-(\d{2}))?"
    r"(?:[T ](\d{2})(?::(\d{2}))?(?::(\d{2}))?)?"
    r"(Z|[+-]\d{2}:?\d{2})?$"
)


def parse_instant(value: str) -> datetime:
    """Parse dbeam's lenient partition timestamps to a UTC datetime."""
    m = _INSTANT_RE.match(value.strip())
    if not m:
        raise ValueError(f"Cannot parse partition instant: {value!r}")
    year, month, day, hour, minute, sec, off = m.groups()
    dt = datetime(
        int(year),
        int(month or 1),
        int(day or 1),
        int(hour or 0),
        int(minute or 0),
        int(sec or 0),
        tzinfo=timezone.utc,
    )
    if off and off != "Z":
        # Apply the UTC offset like java.time would: the wall time is in
        # the given zone, so subtract the offset to reach UTC.
        sign = 1 if off[0] == "+" else -1
        dt -= sign * timedelta(hours=int(off[1:3]), minutes=int(off[-2:]))
    return dt


def parse_period(value: str | None) -> str | timedelta:
    """--partitionPeriod: ISO-8601; 'PT…' means sub-daily timedelta,
    otherwise a calendar period string (P1D default)."""
    if value is None:
        return "P1D"
    v = value.strip().upper()
    if "T" in v:
        m = re.fullmatch(r"PT(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?", v)
        if not m:
            raise ValueError(f"Unsupported partition period: {value}")
        h, mi, s = (int(x or 0) for x in m.groups())
        return timedelta(hours=h, minutes=mi, seconds=s)
    if not re.fullmatch(r"P\d+[DWMY]", v):
        raise ValueError(f"Unsupported partition period: {value}")
    return v


def _minus_period(dt: datetime, period: str | timedelta, times: int = 1) -> datetime:
    if isinstance(period, timedelta):
        return dt - period * times
    m = re.fullmatch(r"P(\d+)([DWMY])", period.upper())
    if not m:
        raise ValueError(f"Unsupported period: {period}")
    n, unit = int(m.group(1)) * times, m.group(2)
    d = dt.date()
    if unit == "D":
        d = d - timedelta(days=n)
    elif unit == "W":
        d = d - timedelta(weeks=n)
    else:
        months = n * (12 if unit == "Y" else 1)
        month0 = d.year * 12 + (d.month - 1) - months
        year, month = month0 // 12, month0 % 12 + 1
        last = [31, 29 if _leap(year) else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31][
            month - 1
        ]
        d = date(year, month, min(d.day, last))
    return datetime(
        d.year, d.month, d.day, dt.hour, dt.minute, dt.second, tzinfo=timezone.utc
    )


def min_partition_datetime(
    now: datetime,
    period: str | timedelta,
    min_partition_period: datetime | None = None,
) -> datetime:
    """Default freshness floor: now − 2×partitionPeriod (ref
    JdbcExportArgsFactory.createQueryArgs)."""
    if min_partition_period is not None:
        return min_partition_period
    return _minus_period(now, period, times=2)


def validate_partition(
    partition: datetime | None,
    period: str | timedelta = "P1D",
    *,
    partition_column: str | None = None,
    skip_partition_check: bool = False,
    min_partition_period: datetime | None = None,
    now: datetime | None = None,
) -> None:
    """Raise NotReadyError when exporting a too-old partition without
    a partition column (snapshot dumps into old partitions)."""
    if skip_partition_check or partition_column is not None:
        return
    if partition is None:
        return
    now = now or datetime.now(timezone.utc)
    floor = min_partition_datetime(now, period, min_partition_period)
    if partition < floor:
        raise NotReadyError(
            f"Partition date {partition.isoformat()} is too old, "
            f"minimum is {floor.isoformat()}"
        )
