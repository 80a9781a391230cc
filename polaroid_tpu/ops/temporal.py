"""Vectorized civil-calendar math on device.

TPU-native replacement for the reference's chrono-based temporal kernels
(`crates/polars-time/src/`): everything is branch-free integer arithmetic
on epoch counts (Howard Hinnant's civil-calendar algorithms), so `.dt.*`
runs on the VPU with no host round trips.
"""

from __future__ import annotations

import jax.numpy as jnp

SECONDS_PER_DAY = 86_400
UNIT_PER_SECOND = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _fdiv(a, b):
    return jnp.floor_divide(a, b)


def days_to_civil(z):
    """Epoch days -> (year, month, day), vectorized (Hinnant's algorithm)."""
    z = z.astype(jnp.int32) + 719468
    era = _fdiv(z, 146097)
    doe = z - era * 146097
    yoe = _fdiv(doe - _fdiv(doe, 1460) + _fdiv(doe, 36524) - _fdiv(doe, 146096), 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + _fdiv(yoe, 4) - _fdiv(yoe, 100))
    mp = _fdiv(5 * doy + 2, 153)
    d = doy - _fdiv(153 * mp + 2, 5) + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    y = y + (m <= 2)
    return y.astype(jnp.int32), m.astype(jnp.int32), d.astype(jnp.int32)


def civil_to_days(y, m, d):
    """(year, month, day) -> epoch days."""
    y = y - (m <= 2)
    era = _fdiv(y, 400)
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = _fdiv(153 * mp + 2, 5) + d - 1
    doe = yoe * 365 + _fdiv(yoe, 4) - _fdiv(yoe, 100) + doy
    return (era * 146097 + doe - 719468).astype(jnp.int32)


def epoch_to_days(value, time_unit: str):
    """Datetime epoch count -> epoch days (floor)."""
    per_day = UNIT_PER_SECOND[time_unit] * SECONDS_PER_DAY
    return _fdiv(value, per_day).astype(jnp.int32)


def time_of_day(value, time_unit: str):
    """Datetime epoch count -> count within the day (non-negative)."""
    per_day = UNIT_PER_SECOND[time_unit] * SECONDS_PER_DAY
    return value - _fdiv(value, per_day) * per_day


def weekday(days):
    """ISO weekday 1..7 (Mon=1) from epoch days (1970-01-01 was a Thursday)."""
    return (jnp.remainder(days.astype(jnp.int64) + 3, 7) + 1).astype(jnp.int32)


def ordinal_day(days):
    y, _, _ = days_to_civil(days)
    jan1 = civil_to_days(y, jnp.ones_like(y), jnp.ones_like(y))
    return (days - jan1 + 1).astype(jnp.int32)


def _weeks_in_iso_year(y):
    """52 or 53 (closed form: 53 iff Jan 1 is Thu, or leap year and Jan 1
    is Wed — expressed via the p(y) day-of-week polynomial)."""
    p = jnp.remainder(y + _fdiv(y, 4) - _fdiv(y, 100) + _fdiv(y, 400), 7)
    pm1 = y - 1
    p1 = jnp.remainder(pm1 + _fdiv(pm1, 4) - _fdiv(pm1, 100) + _fdiv(pm1, 400), 7)
    return jnp.where((p == 4) | (p1 == 3), 53, 52)


def iso_week(days):
    """ISO-8601 week number, branch-free."""
    doy = ordinal_day(days)
    wd = weekday(days)
    raw = _fdiv(doy - wd + 10, 7)
    y, _, _ = days_to_civil(days)
    week = jnp.where(raw < 1, _weeks_in_iso_year(y - 1),
                     jnp.where(raw > _weeks_in_iso_year(y), 1, raw))
    return week.astype(jnp.int32)


_EVERY_UNIT_COUNTS = {
    "ns": 1, "us": 1_000, "ms": 1_000_000, "s": 1_000_000_000,
    "m": 60 * 1_000_000_000, "h": 3_600 * 1_000_000_000,
    "d": 86_400 * 1_000_000_000, "w": 7 * 86_400 * 1_000_000_000,
}


def parse_every(every: str):
    """Parse a polars duration string like '1h', '15m', '1mo', '1y'.
    Returns ('fixed', nanoseconds) or ('months', n)."""
    import re
    total_ns = 0
    months = 0
    for num, unit in re.findall(r"(\d+)(mo|ns|us|ms|s|m|h|d|w|q|y|i)", every):
        n = int(num)
        if unit == "mo":
            months += n
        elif unit == "q":
            months += 3 * n
        elif unit == "y":
            months += 12 * n
        elif unit == "i":
            total_ns += n  # index count; treated as raw units by caller
        else:
            total_ns += n * _EVERY_UNIT_COUNTS[unit]
    if months and total_ns:
        raise ValueError(f"cannot mix month and sub-month units in {every!r}")
    if months:
        return ("months", months)
    return ("fixed", total_ns)


def truncate_epoch(value, time_unit: str, every: str):
    kind, n = parse_every(every)
    if kind == "fixed":
        step = n // (1_000_000_000 // UNIT_PER_SECOND[time_unit]) \
            if time_unit != "ns" else n
        step = max(step, 1)
        return _fdiv(value, step) * step
    # month-based truncation via civil calendar
    days = epoch_to_days(value, time_unit)
    y, m, _ = days_to_civil(days)
    total_m = (y.astype(jnp.int64) * 12 + (m - 1))
    total_m = _fdiv(total_m, n) * n
    ny = _fdiv(total_m, 12).astype(jnp.int32)
    nm = (total_m - ny * 12 + 1).astype(jnp.int32)
    d0 = civil_to_days(ny, nm, jnp.ones_like(nm))
    per_day = UNIT_PER_SECOND[time_unit] * SECONDS_PER_DAY
    return d0.astype(value.dtype) * per_day


def truncate_days(days, every: str):
    kind, n = parse_every(every)
    if kind == "fixed":
        step = max(n // (86_400 * 1_000_000_000), 1)
        # epoch day 0 is a Thursday; polars truncates weeks to Monday
        if every.endswith("w") and step % 7 == 0:
            return _fdiv(days + 3, step) * step - 3
        return _fdiv(days, step) * step
    y, m, _ = days_to_civil(days)
    total_m = (y.astype(jnp.int64) * 12 + (m - 1))
    total_m = _fdiv(total_m, n) * n
    ny = _fdiv(total_m, 12).astype(jnp.int32)
    nm = (total_m - ny * 12 + 1).astype(jnp.int32)
    return civil_to_days(ny, nm, jnp.ones_like(nm))
