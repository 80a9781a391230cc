"""Timezone offset tables for tz-aware Datetime columns.

The engine stores Datetime columns as UTC epochs; a time-zone label on the
dtype changes how wall-clock components are derived (reference:
polars-time DST handling, `polars-time/src/`). Offsets are DST-dependent,
so each zone gets a transition table (instant, utcoffset, dst) built once
on host from `zoneinfo` by daily probing + bisecting each transition to
the exact second (1900..2100). Device lookups are a searchsorted into the
~300-entry table — vectorized, no per-row host work.
"""

from __future__ import annotations

import functools
import re
from datetime import datetime, timedelta, timezone

import numpy as np

import jax.numpy as jnp

from ..errors import ComputeError
from . import temporal as T

_START = -2208988800          # 1900-01-01T00:00:00Z
_END = 4102444800             # 2100-01-01T00:00:00Z
_DAY = 86400

_FIXED = re.compile(r"(?:UTC)?([+-])(\d{2}):?(\d{2})$")


@functools.lru_cache(maxsize=64)
def offset_table(tz_name: str):
    """(transitions s, utcoffset s, dst s) as numpy arrays; offsets[i]
    applies for instants in [transitions[i], transitions[i+1])."""
    if tz_name in ("UTC", "utc", "Etc/UTC", "GMT"):
        return (np.array([_START], np.int64), np.array([0], np.int32),
                np.array([0], np.int32))
    m = _FIXED.fullmatch(tz_name)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        off = sign * (int(m.group(2)) * 3600 + int(m.group(3)) * 60)
        return (np.array([_START], np.int64), np.array([off], np.int32),
                np.array([0], np.int32))
    try:
        from zoneinfo import ZoneInfo
        tz = ZoneInfo(tz_name)
    except Exception as exc:
        raise ComputeError(f"unknown time zone {tz_name!r}: {exc}")

    def probe(ts: int):
        d = datetime.fromtimestamp(ts, tz)
        return (int(d.utcoffset().total_seconds()),
                int((d.dst() or timedelta()).total_seconds()))

    trans = [_START]
    cur = probe(_START)
    offs = [cur[0]]
    dsts = [cur[1]]
    t = _START
    while t < _END:
        t2 = t + _DAY
        nxt = probe(t2)
        if nxt != cur:
            lo, hi = t, t2
            while hi - lo > 1:
                mid = (lo + hi) // 2
                if probe(mid) != cur:
                    hi = mid
                else:
                    lo = mid
            trans.append(hi)
            offs.append(nxt[0])
            dsts.append(nxt[1])
            cur = nxt
        t = t2
    return (np.asarray(trans, np.int64), np.asarray(offs, np.int32),
            np.asarray(dsts, np.int32))


def _lookup(sec, trans, vals):
    """vals[i] for the interval containing each instant (device)."""
    idx = jnp.clip(jnp.searchsorted(jnp.asarray(trans), sec, side="right")
                   - 1, 0, len(trans) - 1)
    return jnp.asarray(vals)[idx]


def utc_offset(x, time_unit: str, tz_name: str, *, dst_only: bool = False,
               base_only: bool = False):
    """Per-element utcoffset (in `time_unit` ticks) at UTC instants `x`."""
    trans, offs, dsts = offset_table(tz_name)
    per_s = T.UNIT_PER_SECOND[time_unit]
    sec = jnp.floor_divide(x.astype(jnp.int64), per_s)
    if dst_only:
        val = _lookup(sec, trans, dsts)
    elif base_only:
        val = _lookup(sec, trans, offs - dsts)
    else:
        val = _lookup(sec, trans, offs)
    return val.astype(x.dtype) * per_s


def localize(x, time_unit: str, tz_name: str):
    """UTC epoch -> local wall-clock 'epoch' (the instant whose UTC civil
    decomposition equals the local civil time)."""
    return x + utc_offset(x, time_unit, tz_name)


def delocalize(wall, time_unit: str, tz_name: str):
    """Local wall-clock 'epoch' -> UTC epoch. Two-step fixed point; at a
    DST fold the earlier offset wins, in a gap the pre-gap offset applies
    (deterministic; polars' ambiguous='earliest')."""
    e0 = wall - utc_offset(wall, time_unit, tz_name)
    return wall - utc_offset(e0, time_unit, tz_name)
