"""Datetime parsers — layout-cascading parse like the reference's
pluggable parsers (/root/reference/analysis/datetime/*: flexible =
try each layout in order, iso, timestamp-{s,ms,us,ns}).

All parsing happens driver-side (query bounds) or as native
``to_timestamp`` columns; results are naive UTC datetimes matching the
engine's TimestampType comparisons.
"""

from __future__ import annotations

from datetime import datetime, timezone

# strptime layouts tried in order — the spirit of the reference's
# "dateTimeOptional"/flexible default layout set
_LAYOUTS = [
    "%Y-%m-%dT%H:%M:%S.%f%z",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M",
    "%Y-%m-%d %H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d %H:%M",
    "%Y-%m-%d",
    "%Y/%m/%d %H:%M:%S",
    "%Y/%m/%d",
    "%d %b %Y %H:%M:%S",
    "%d %b %Y",
    "%a, %d %b %Y %H:%M:%S %z",  # RFC1123Z
]

# numeric-string magnitude → unit, mirroring timestamp/{seconds,
# milliseconds,microseconds,nanoseconds} (each reference parser is
# fixed-unit; we dispatch by digit count, covering 1970..2100+)
_UNIT_DIVISORS = [
    (11, 1),              # ≤11 digits: seconds
    (14, 1_000),          # milliseconds
    (17, 1_000_000),      # microseconds
    (20, 1_000_000_000),  # nanoseconds
]


def parse_datetime(s) -> datetime | None:
    """Parse a query-side datetime literal; None for unparseable.

    Accepts datetimes, ISO/RFC layouts (cascaded), 'Z' suffix, and
    integer unix timestamps in s/ms/µs/ns by magnitude."""
    if s is None:
        return None
    if isinstance(s, datetime):
        dt = s
    elif isinstance(s, (int, float)) or (
        isinstance(s, str) and s.lstrip("-").isdigit()
    ):
        v = int(s)
        nd = len(str(abs(v)))
        div = next(
            (d for max_d, d in _UNIT_DIVISORS if nd <= max_d),
            1_000_000_000,
        )
        return datetime.fromtimestamp(v / div, tz=timezone.utc).replace(
            tzinfo=None
        )
    else:
        txt = s.replace("Z", "+0000") if s.endswith("Z") else s
        dt = None
        for layout in _LAYOUTS:
            try:
                dt = datetime.strptime(txt, layout)
                break
            except ValueError:
                continue
        if dt is None:
            return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt
