"""Expression evaluation over device tables.

Capability analogue of the reference's physical expressions
(`crates/polars-expr/src/expressions/` — evaluate() at
`expressions/mod.rs:678`), re-designed for XLA: every operation is a
vectorized masked computation over the full fixed-capacity column arrays;
dead rows compute garbage that is never observed. Null semantics follow
polars: null-propagating arithmetic/comparisons, Kleene and/or, and
null-ignoring aggregations.

Order-dependent ("window") ops work in *live order*: a stable argsort on
the live mask compacts live rows to the front (device-side, no host sync),
the op runs on the prefix, and an inverse permutation scatters results
back to original row slots.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..batch import Column, Table, storage_numpy_dtype
from ..dtypes import (
    Boolean, DataType, Date, Datetime, Duration, Float32, Float64, Int8,
    Int16, Int32, Int64, Null, String, UInt8, UInt16, UInt32, UInt64,
    supertype,
)
from ..errors import ComputeError, InvalidOperationError, ShapeError
from ..strings import NULL_CODE, StringDict
from ..ops import temporal as T
from .expr import Expr
from . import meta

__all__ = ["Val", "eval_expr", "eval_to_column"]

_CMP_OPS = {"eq", "neq", "lt", "le", "gt", "ge"}
_BOOL_OPS = {"and", "or", "xor"}


class Val:
    """Evaluation result: device data + validity (+ live override).

    data shape: (capacity,) for row-wise results, (1,) for scalars.
    `live`: optional bool mask overriding the table's live mask (set by
    expr-level filter/drop_nulls, consumed by aggregations).
    """

    __slots__ = ("dtype", "data", "validity", "sdict", "is_scalar", "live",
                 "lengths", "elem_valid", "fields")

    def __init__(self, dtype, data, validity=None, sdict=None,
                 is_scalar=False, live=None, lengths=None, elem_valid=None,
                 fields=None):
        self.dtype = dtype
        self.data = data
        self.validity = validity
        self.sdict = sdict
        self.is_scalar = is_scalar
        self.live = live
        # nested layouts (see batch.Column): List -> 2-D data + lengths
        # (+ optional elem_valid); Struct -> fields dict of child Vals
        self.lengths = lengths
        self.elem_valid = elem_valid
        self.fields = fields

    def valid_or_true(self):
        if self.validity is None:
            return jnp.ones(self.data.shape, dtype=jnp.bool_)
        return self.validity


def _and_valid(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a & b


def _stor(dt: DataType):
    return jnp.dtype(storage_numpy_dtype(dt))


def _bcast(v: Val, capacity: int) -> Val:
    """Broadcast a scalar Val to full capacity."""
    if not v.is_scalar:
        return v
    data = jnp.broadcast_to(v.data, (capacity,))
    validity = None if v.validity is None else jnp.broadcast_to(v.validity, (capacity,))
    return Val(v.dtype, data, validity, v.sdict, False, None)


# ---------------------------------------------------------------------------
# live-order machinery for order-dependent ops
# ---------------------------------------------------------------------------

def _live_order(table: Table):
    """(perm, inv, count): perm gathers live rows to the front in original
    order; inv scatters front-results back to original slots."""
    mask = table.row_mask()
    perm = jnp.argsort(~mask, stable=True)
    inv = jnp.argsort(perm, stable=True)
    count = jnp.sum(mask)
    return mask, perm, inv, count


# ---------------------------------------------------------------------------
# casting
# ---------------------------------------------------------------------------

def _rebrand_val(v: Val, dtype: DataType) -> Val:
    """Same physical data under a different logical dtype (extension
    wrap/unwrap — reference: polars ext_to/ext_storage expressions)."""
    out = Val(dtype, v.data, v.validity, v.sdict, v.is_scalar, v.live,
              v.lengths, v.elem_valid, v.fields)
    return out


def cast_val(v: Val, dtype: DataType, strict: bool = True,
             live_mask=None) -> Val:
    if isinstance(dtype, type) and issubclass(dtype, DataType):
        dtype = dtype()
    if v.dtype == dtype:
        return v
    from ..dtypes import BaseExtension as _BaseExt
    if isinstance(v.dtype, _BaseExt):
        v = _rebrand_val(v, v.dtype.storage)
        if v.dtype == dtype:
            return v
    if isinstance(dtype, _BaseExt):
        inner = cast_val(v, dtype.storage, strict, live_mask)
        return _rebrand_val(inner, dtype)
    src, dst = v.dtype, dtype
    if src.is_string and dst.is_string:
        if src.is_binary != dst.is_binary:
            # utf8 encode/decode is order-preserving (UTF-8 byte order ==
            # code-point order), so the sorted dictionary stays sorted and
            # codes carry over; invalid utf8 -> null (or raise if strict)
            sd = v.sdict or EMPTY_SDICT
            if dst.is_binary:
                vals = np.array([str(w).encode("utf-8") for w in sd.values],
                                dtype=object)
                return Val(dst, v.data, v.validity, StringDict(vals),
                           v.is_scalar, v.live)
            mapped = []
            bad = np.zeros(max(len(sd.values), 1), dtype=bool)
            for i, w in enumerate(sd.values):
                try:
                    mapped.append(bytes(w).decode("utf-8"))
                except (UnicodeDecodeError, TypeError):
                    if strict:
                        raise InvalidOperationError(
                            f"cast Binary->String: invalid utf-8 {w!r}")
                    mapped.append(None)
                    bad[i] = True
            return _remap_dict_val(v, mapped, dst)
        # String <-> Categorical: same codes + dictionary, relabeled
        # (our dictionaries are sorted, so they double as categories)
        return Val(dst, v.data, v.validity, v.sdict, v.is_scalar, v.live)
    if src == Null:
        data = jnp.zeros(v.data.shape, dtype=_stor(dst))
        return Val(dst, data, jnp.zeros(v.data.shape, dtype=jnp.bool_),
                   EMPTY_SDICT if dst.is_string else None, v.is_scalar, v.live)
    if dst.is_string:
        # host-side formatting (dictionary build needs variable-length
        # strings; one device->host round trip, documented)
        vals = np.asarray(v.data)
        if src.is_bool:
            txt = np.where(vals, "true", "false").astype(object)
        elif src.is_float:
            txt = np.array([_fmt_float(x) for x in vals], dtype=object)
        elif src == Date:
            txt = vals.astype("datetime64[D]").astype(str).astype(object)
        elif isinstance(src, Datetime):
            txt = vals.astype(f"datetime64[{src.time_unit}]").astype(str) \
                .astype(object)
        else:
            txt = vals.astype(str).astype(object)
        codes, sd = StringDict.encode(txt, np.ones(len(txt), bool))
        return Val(dst, jnp.asarray(codes), v.validity, sd, v.is_scalar,
                   v.live)
    if src.is_string:
        # parse via per-code host lookup table (O(unique) host work)
        sd = v.sdict or EMPTY_SDICT

        def parse(s):
            try:
                if dst.is_float:
                    return float(s)
                if dst.is_bool:
                    return s in ("true", "True", "1")
                return int(str(s).strip())  # "12.5" is not an int (polars)
            except (ValueError, TypeError):
                return None
        oks = sd.map_to_array(lambda s: parse(s) is not None, np.bool_)
        lut = sd.map_to_array(lambda s: parse(s) or 0,
                              storage_numpy_dtype(dst))
        if len(lut) == 0:
            data = jnp.zeros(v.data.shape, jnp.dtype(storage_numpy_dtype(dst)))
            okv = jnp.zeros(v.data.shape, jnp.bool_)
        else:
            code = jnp.clip(v.data, 0, len(lut) - 1)
            data = jnp.asarray(lut)[code]
            okv = jnp.asarray(oks)[code]
        if strict and not isinstance(v.data, jax.core.Tracer):
            # eager strict cast: raise if any live, non-null row failed to
            # parse (one host sync; inside fused traces the check is
            # skipped and failures become nulls, like the streaming path)
            bad = ~okv
            if v.validity is not None and \
                    not isinstance(v.validity, jax.core.Tracer):
                bad = bad & v.validity
            for live in (getattr(v, "live", None), live_mask):
                if live is not None and \
                        not isinstance(live, jax.core.Tracer) and \
                        getattr(live, "shape", None) == bad.shape:
                    bad = bad & live
            if bool(jnp.any(bad)):
                first = sd.values[int(np.asarray(v.data).flat[
                    int(jnp.argmax(bad))])] if len(sd.values) else "?"
                raise InvalidOperationError(
                    f"conversion from `str` to `{dst!r}` failed for "
                    f"value {first!r}; use strict=False to set "
                    "failures to null")
        return Val(dst, data, _and_valid(v.validity, okv), None,
                   v.is_scalar, v.live)
    if src == Date and isinstance(dst, Datetime):
        per_day = T.UNIT_PER_SECOND[dst.time_unit] * T.SECONDS_PER_DAY
        data = v.data.astype(_stor(dst)) * per_day
        return Val(dst, data, v.validity, None, v.is_scalar, v.live)
    if isinstance(src, Datetime) and dst == Date:
        data = T.epoch_to_days(v.data, src.time_unit)
        return Val(dst, data, v.validity, None, v.is_scalar, v.live)
    if isinstance(src, Datetime) and isinstance(dst, Datetime):
        data = _rescale_time(v.data, src.time_unit, dst.time_unit)
        return Val(dst, data, v.validity, None, v.is_scalar, v.live)
    if isinstance(src, Duration) and isinstance(dst, Duration):
        data = _rescale_time(v.data, src.time_unit, dst.time_unit)
        return Val(dst, data, v.validity, None, v.is_scalar, v.live)
    if dst.is_bool:
        data = v.data != 0
        return Val(dst, data, v.validity, None, v.is_scalar, v.live)
    data = v.data.astype(_stor(dst))
    return Val(dst, data, v.validity, None, v.is_scalar, v.live)


def _rescale_time(data, src_unit, dst_unit):
    s, d = T.UNIT_PER_SECOND[src_unit], T.UNIT_PER_SECOND[dst_unit]
    if d >= s:
        return data * (d // s)
    return jnp.floor_divide(data, s // d)


# ---------------------------------------------------------------------------
# literals
# ---------------------------------------------------------------------------

EMPTY_SDICT = StringDict(np.array([], dtype=object))


def _fmt_float(x) -> str:
    if x == int(x) and abs(x) < 1e15:
        return f"{x:.1f}"
    return repr(float(x))


def _lit_val(value, dtype: Optional[DataType]) -> Val:
    import datetime as _pydt

    dt = meta._lit_dtype(value, dtype)
    if value is None:
        return Val(dt if dtype is not None else Null,
                   jnp.zeros((1,), dtype=_stor(dt) if dt != Null else jnp.bool_),
                   jnp.zeros((1,), dtype=jnp.bool_),
                   EMPTY_SDICT if dt.is_string else None, True)
    if isinstance(value, (list, tuple, np.ndarray)):
        arr = np.asarray(value)
        from ..dtypes import dtype_from_numpy
        adt = dtype_from_numpy(arr.dtype) if dtype is None else dtype
        return Val(adt, jnp.asarray(arr.astype(storage_numpy_dtype(adt))),
                   None, None, False)
    if dt.is_string:
        lv = bytes(value) if isinstance(value, (bytes, bytearray)) \
            else str(value)
        sd = StringDict(np.array([lv], dtype=object))
        return Val(dt, jnp.zeros((1,), dtype=jnp.int32), None, sd, True)
    if dt == Date:
        days = (value - _pydt.date(1970, 1, 1)).days
        return Val(dt, jnp.full((1,), days, dtype=jnp.int32), None, None, True)
    if isinstance(dt, Datetime):
        scale = T.UNIT_PER_SECOND[dt.time_unit]
        epoch = int(value.timestamp() * scale) if isinstance(value, _pydt.datetime) \
            else int(value)
        return Val(dt, jnp.full((1,), epoch, dtype=jnp.int64), None, None, True)
    if isinstance(dt, Duration):
        scale = T.UNIT_PER_SECOND[dt.time_unit]
        cnt = int(value.total_seconds() * scale) if isinstance(value, _pydt.timedelta) \
            else int(value)
        return Val(dt, jnp.full((1,), cnt, dtype=jnp.int64), None, None, True)
    return Val(dt, jnp.full((1,), value, dtype=_stor(dt)), None, None, True)


# ---------------------------------------------------------------------------
# string dictionary alignment
# ---------------------------------------------------------------------------

def _align_strings(l: Val, r: Val) -> Tuple[Val, Val]:
    """Recode two string Vals onto one merged dictionary."""
    if l.sdict is r.sdict:
        return l, r
    ld = l.sdict or EMPTY_SDICT
    rd = r.sdict or EMPTY_SDICT
    merged, ra, rb = ld.merge(rd)

    def recode(v, remap):
        if len(remap) == 0:
            return Val(v.dtype, v.data, v.validity, merged, v.is_scalar, v.live)
        rm = jnp.asarray(remap)
        code = v.data
        new = jnp.where(code >= 0, rm[jnp.clip(code, 0, len(remap) - 1)], NULL_CODE)
        return Val(v.dtype, new, v.validity, merged, v.is_scalar, v.live)

    return recode(l, ra), recode(r, rb)


# ---------------------------------------------------------------------------
# binary ops
# ---------------------------------------------------------------------------

def _eval_fma(op: str, a: Val, b: Val, c: Val, table: Table) -> Val:
    """Fused multiply-add family (reference: `polars-plan/src/plans/
    optimizer/fused.rs` FusedMultiplyAdd/Sub): one XLA computation
    instead of two eager dispatches and an intermediate array in HBM.
    op: fma = a*b+c, fms = a*b-c, fsm = c-a*b. Dtype/overflow semantics
    match the unfused chain (multiply in supertype(a,b), then combine
    in supertype(·, c))."""
    def _num(v):
        return v.dtype.is_integer or v.dtype.is_float
    if not (_num(a) and _num(b) and _num(c)):
        m = _eval_binary("mul", a, b, table)
        if op == "fsm":
            return _eval_binary("sub", c, m, table)
        return _eval_binary("add" if op == "fma" else "sub", m, c, table)
    st1 = supertype(a.dtype, b.dtype)
    st = supertype(st1, c.dtype)
    x = cast_val(a, st1).data
    y = cast_val(b, st1).data
    z = cast_val(c, st).data
    prod = x * y
    if st1 != st:
        prod = prod.astype(_stor(st))
    if op == "fma":
        data = prod + z
    elif op == "fms":
        data = prod - z
    else:
        data = z - prod
    validity = _and_valid(_and_valid(a.validity, b.validity), c.validity)
    return Val(st, data, validity, None,
               a.is_scalar and b.is_scalar and c.is_scalar)


def _eval_binary(op: str, l: Val, r: Val, table: Table) -> Val:
    # strings first
    if l.dtype.is_string or r.dtype.is_string:
        return _eval_binary_str(op, l, r, table)
    if l.dtype == Null or r.dtype == Null:
        cap = table.capacity if not (l.is_scalar and r.is_scalar) else 1
        out_dt = Boolean if op in _CMP_OPS or op in _BOOL_OPS else \
            (l.dtype if r.dtype == Null else r.dtype)
        if out_dt == Null:
            out_dt = Boolean
        return Val(out_dt, jnp.zeros((cap,), dtype=_stor(out_dt)),
                   jnp.zeros((cap,), dtype=jnp.bool_), None,
                   l.is_scalar and r.is_scalar)

    if op in _BOOL_OPS and l.dtype.is_bool and r.dtype.is_bool:
        return _eval_kleene(op, l, r)

    # temporal +/- first: Date/Datetime x Duration have no supertype
    if isinstance(l.dtype, (Datetime, Duration)) or l.dtype == Date or \
       isinstance(r.dtype, (Datetime, Duration)) or r.dtype == Date:
        return _eval_binary_temporal(op, l, r, table)

    st = supertype(l.dtype, r.dtype)
    out_dt = st
    if op in _CMP_OPS:
        out_dt = Boolean
    elif op == "arctan2":
        out_dt = Float32 if st == Float32 else Float64
        st = out_dt
    elif op == "truediv":
        if isinstance(st, Duration):
            out_dt = Float64
        else:
            out_dt = Float32 if st == Float32 else Float64
        st = out_dt if not isinstance(st, Duration) else st
    elif op == "sub" and isinstance(st, Datetime):
        out_dt = Duration(st.time_unit)
    elif op == "sub" and st == Date and l.dtype == Date and r.dtype == Date:
        out_dt = Duration("ms")

    a = cast_val(l, st) if not op == "truediv" else cast_val(l, out_dt)
    b = cast_val(r, st) if not op == "truediv" else cast_val(r, out_dt)
    x, y = a.data, b.data
    validity = _and_valid(
        None if l.validity is None else l.validity,
        None if r.validity is None else r.validity)

    if op == "add":
        data = x + y
    elif op == "sub":
        data = x - y
    elif op == "mul":
        data = x * y
    elif op == "truediv":
        data = x / y
    elif op == "floordiv":
        if st.is_integer:
            zero = y == 0
            data = jnp.floor_divide(x, jnp.where(zero, 1, y))
            validity = _and_valid(validity, ~zero)
        else:
            data = jnp.floor(x / y)
    elif op == "mod":
        if st.is_integer:
            zero = y == 0
            data = jnp.remainder(x, jnp.where(zero, 1, y))
            validity = _and_valid(validity, ~zero)
        else:
            data = jnp.remainder(x, y)
    elif op == "pow":
        if st.is_integer:
            data = jnp.power(x, y)
        else:
            data = jnp.power(x, y)
    elif op == "arctan2":
        data = jnp.arctan2(x, y)
    elif op in _CMP_OPS:
        data = _cmp(op, x, y)
    elif op in _BOOL_OPS:  # bitwise on ints
        data = {"and": jnp.bitwise_and, "or": jnp.bitwise_or,
                "xor": jnp.bitwise_xor}[op](x, y)
    else:
        raise ComputeError(f"unknown binary op {op!r}")

    is_scalar = l.is_scalar and r.is_scalar
    live = l.live if l.live is not None else r.live
    return Val(out_dt, data, validity, None, is_scalar, live)


def _cmp(op, x, y):
    return {"eq": jnp.equal, "neq": jnp.not_equal, "lt": jnp.less,
            "le": jnp.less_equal, "gt": jnp.greater,
            "ge": jnp.greater_equal}[op](x, y)


def _eval_kleene(op: str, l: Val, r: Val) -> Val:
    """Kleene logic for Boolean & / | (reference:
    `polars-arrow/src/compute/boolean_kleene/`)."""
    x, y = l.data, r.data
    xv, yv = l.valid_or_true(), r.valid_or_true()
    if op == "and":
        data = x & y
        validity = (xv & yv) | (xv & ~x) | (yv & ~y)
    elif op == "or":
        data = x | y
        validity = (xv & yv) | (xv & x) | (yv & y)
    else:  # xor: null-propagating
        data = x ^ y
        validity = xv & yv
    if bool_all_static_true(l.validity) and bool_all_static_true(r.validity):
        validity = None
    return Val(Boolean, data, validity, None, l.is_scalar and r.is_scalar,
               l.live if l.live is not None else r.live)


def bool_all_static_true(v) -> bool:
    return v is None


def _eval_binary_temporal(op: str, l: Val, r: Val, table: Table) -> Val:
    ldt, rdt = l.dtype, r.dtype

    def unify_dt(a: Val, b: Val):
        # bring Datetime/Datetime or Duration/Duration to common unit
        st = supertype(a.dtype, b.dtype)
        return cast_val(a, st), cast_val(b, st), st

    if op in _CMP_OPS:
        a, b, _ = unify_dt(l, r)
        data = _cmp(op, a.data, b.data)
        return Val(Boolean, data, _and_valid(l.validity, r.validity), None,
                   l.is_scalar and r.is_scalar, l.live or r.live)

    validity = _and_valid(l.validity, r.validity)
    is_scalar = l.is_scalar and r.is_scalar

    def mk(dt, data):
        return Val(dt, data, validity, None, is_scalar, l.live or r.live)

    if op == "sub":
        if (isinstance(ldt, Datetime) or ldt == Date) and \
           (isinstance(rdt, Datetime) or rdt == Date):
            a, b, st = unify_dt(l, r)
            if st == Date:
                # Date - Date -> Duration(ms) per polars
                ms = (a.data.astype(jnp.int64) - b.data.astype(jnp.int64)) \
                    * (T.SECONDS_PER_DAY * 1000)
                return mk(Duration("ms"), ms)
            return mk(Duration(st.time_unit), a.data - b.data)
        if isinstance(rdt, Duration):
            return _dt_plus_dur(op, l, r, validity, is_scalar)
        if isinstance(ldt, Duration) and isinstance(rdt, Duration):
            a, b, st = unify_dt(l, r)
            return mk(st, a.data - b.data)
    if op == "add":
        if isinstance(ldt, Duration) and isinstance(rdt, Duration):
            a, b, st = unify_dt(l, r)
            return mk(st, a.data + b.data)
        if isinstance(rdt, Duration):
            return _dt_plus_dur(op, l, r, validity, is_scalar)
        if isinstance(ldt, Duration):
            return _dt_plus_dur(op, r, l, validity, is_scalar)
    if isinstance(ldt, Duration) and op in ("mul", "truediv", "floordiv") \
       and rdt.is_numeric:
        if op == "mul":
            return mk(ldt, (l.data.astype(jnp.float64) * r.data).astype(jnp.int64))
        if op == "truediv":
            return mk(ldt, (l.data / r.data).astype(jnp.int64))
        return mk(ldt, jnp.floor_divide(l.data, r.data.astype(jnp.int64)))
    if isinstance(ldt, Duration) and isinstance(rdt, Duration) and op == "truediv":
        a, b, st = unify_dt(l, r)
        return mk(Float64, a.data / b.data)
    if rdt.is_numeric and isinstance(ldt, Duration) is False and op == "mul":
        pass
    raise InvalidOperationError(f"temporal op {op} between {ldt!r} and {rdt!r}")


def _dt_plus_dur(op, dtv: Val, durv: Val, validity, is_scalar) -> Val:
    sign = 1 if op == "add" else -1
    ddt = dtv.dtype
    dur_unit = durv.dtype.time_unit
    if ddt == Date:
        # promote to Datetime(us) like polars does for sub-day durations
        per_day = T.UNIT_PER_SECOND[dur_unit] * T.SECONDS_PER_DAY
        dur = durv.data
        whole_days = jnp.floor_divide(dur, per_day)
        frac = dur - whole_days * per_day
        # if duration is whole days -> stay Date
        data = dtv.data + sign * whole_days.astype(jnp.int32)
        return Val(Date, data, validity, None, is_scalar)
    tu = ddt.time_unit
    dur = _rescale_time(durv.data, dur_unit, tu)
    return Val(ddt, dtv.data + sign * dur, validity, None, is_scalar)


def _eval_binary_str(op: str, l: Val, r: Val, table: Table) -> Val:
    if not (l.dtype.is_string and r.dtype.is_string):
        if l.dtype == Null or r.dtype == Null:
            cap = table.capacity
            return Val(Boolean, jnp.zeros((cap,), jnp.bool_),
                       jnp.zeros((cap,), jnp.bool_))
        raise InvalidOperationError(
            f"binary op {op} between {l.dtype!r} and {r.dtype!r}")
    if op == "add":  # string concat — host dict product; defer
        raise InvalidOperationError("string concatenation not supported yet; "
                                    "use concat_str at collect time")
    if op not in _CMP_OPS:
        raise InvalidOperationError(f"op {op} not supported on strings")
    a, b = _align_strings(l, r)
    data = _cmp(op, a.data, b.data)
    validity = _and_valid(l.validity, r.validity)
    return Val(Boolean, data, validity, None, l.is_scalar and r.is_scalar,
               l.live if l.live is not None else r.live)


# ---------------------------------------------------------------------------
# unary ops
# ---------------------------------------------------------------------------

def _eval_unary(op: str, v: Val, attrs) -> Val:
    x = v.data
    dt = v.dtype
    if op == "not":
        if not dt.is_bool:
            raise InvalidOperationError(f"~ on {dt!r}")
        return Val(Boolean, ~x, v.validity, None, v.is_scalar, v.live)
    if op == "neg":
        return Val(dt, -x, v.validity, None, v.is_scalar, v.live)
    if op == "abs":
        return Val(dt, jnp.abs(x), v.validity, None, v.is_scalar, v.live)
    if op == "sign":
        return Val(dt, jnp.sign(x).astype(x.dtype), v.validity, None,
                   v.is_scalar, v.live)
    if op in ("floor", "ceil"):
        if dt.is_integer:
            return v
        f = jnp.floor if op == "floor" else jnp.ceil
        return Val(dt, f(x), v.validity, None, v.is_scalar, v.live)
    if op == "round":
        if dt.is_integer:
            return v
        d = attrs.get("decimals", 0)
        m = 10.0 ** d
        return Val(dt, jnp.round(x * m) / m, v.validity, None, v.is_scalar, v.live)
    if op == "round_sig_figs":
        digits = int(attrs.get("digits", 1))
        if digits < 1:
            raise InvalidOperationError("round_sig_figs digits must be >= 1")
        xf = x.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        mag = jnp.floor(jnp.log10(jnp.where(xf == 0, 1.0, jnp.abs(xf))))
        m = 10.0 ** (digits - 1 - mag)
        out = jnp.where(xf == 0, 0.0, jnp.round(xf * m) / m)
        return Val(dt, out.astype(x.dtype) if dt.is_integer else out,
                   v.validity, None, v.is_scalar, v.live)
    if op == "reinterpret":
        if not dt.is_integer:
            raise InvalidOperationError(f"reinterpret on {dt!r}")
        signed = attrs.get("signed", True)
        nbits = x.dtype.itemsize * 8
        tgt = jnp.dtype(f"int{nbits}") if signed else jnp.dtype(f"uint{nbits}")
        out_dt = {jnp.dtype("int8"): Int8, jnp.dtype("int16"): Int16,
                  jnp.dtype("int32"): Int32, jnp.dtype("int64"): Int64,
                  jnp.dtype("uint8"): UInt8, jnp.dtype("uint16"): UInt16,
                  jnp.dtype("uint32"): UInt32, jnp.dtype("uint64"): UInt64}[tgt]
        return Val(out_dt, jax.lax.bitcast_convert_type(x, tgt), v.validity,
                   None, v.is_scalar, v.live)
    if op.startswith("bit_"):
        return _eval_bit_unary(op, v)
    # float math
    out_dt = Float32 if dt == Float32 else Float64
    xf = x.astype(_stor(out_dt))
    fns = {
        "sqrt": jnp.sqrt, "cbrt": jnp.cbrt, "exp": jnp.exp,
        "log1p": jnp.log1p, "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
        "arcsin": jnp.arcsin, "arccos": jnp.arccos, "arctan": jnp.arctan,
        "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
        "arcsinh": jnp.arcsinh, "arccosh": jnp.arccosh,
        "arctanh": jnp.arctanh, "cot": lambda a: 1.0 / jnp.tan(a),
        "degrees": jnp.degrees, "radians": jnp.radians,
    }
    if op == "log":
        base = attrs.get("base", float(np.e))
        data = jnp.log(xf) / float(np.log(base))
    elif op in fns:
        data = fns[op](xf)
    else:
        raise ComputeError(f"unknown unary op {op!r}")
    return Val(out_dt, data, v.validity, None, v.is_scalar, v.live)


def _eval_bit_unary(op: str, v: Val) -> Val:
    """Bit introspection kernels (reference: polars-compute/src/bitwise/).
    popcount/clz via lax; trailing counts via clz of the bit-reversed
    isolate-lowest-set-bit trick."""
    x = v.data
    dt = v.dtype
    if dt.is_bool:
        x = x.astype(jnp.uint8)  # count within 1 logical bit
        nbits = 1
    elif dt.is_integer:
        nbits = x.dtype.itemsize * 8
    else:
        raise InvalidOperationError(f"{op} on {dt!r}")
    ux = x.astype(jnp.dtype(f"uint{max(x.dtype.itemsize * 8, 8)}"))
    width = ux.dtype.itemsize * 8

    def pop(a):
        return jax.lax.population_count(a)

    def clz(a):
        return jax.lax.clz(a)

    if op == "bit_count_ones":
        out = pop(ux)
        if dt.is_bool:
            out = jnp.minimum(out, 1)
    elif op == "bit_count_zeros":
        out = nbits - jnp.minimum(pop(ux), nbits)
    elif op == "bit_leading_zeros":
        out = jnp.minimum(clz(ux) - (width - nbits), nbits)
    elif op == "bit_leading_ones":
        inv = (~ux) & ((jnp.array(1, ux.dtype) << nbits) - 1) \
            if nbits < width else ~ux
        out = jnp.minimum(clz(inv) - (width - nbits), nbits)
    elif op == "bit_trailing_zeros":
        low = ux & (-ux.astype(jnp.dtype(f"int{width}"))).astype(ux.dtype)
        out = jnp.where(ux == 0, nbits, width - 1 - clz(low))
    elif op == "bit_trailing_ones":
        inc = ux + 1
        low = inc & (-inc.astype(jnp.dtype(f"int{width}"))).astype(ux.dtype)
        all1 = ux == ((jnp.array(1, ux.dtype) << nbits) - 1) if nbits < width \
            else ux == jnp.array(-1, jnp.dtype(f"int{width}")).astype(ux.dtype)
        out = jnp.where(all1, nbits, width - 1 - clz(low))
    else:
        raise ComputeError(f"unknown bit op {op!r}")
    return Val(UInt32, out.astype(jnp.uint32), v.validity, None,
               v.is_scalar, v.live)


# ---------------------------------------------------------------------------
# aggregations (select context — full column reductions)
# ---------------------------------------------------------------------------

def _agg_mask(v: Val, table: Table):
    """Rows that participate: table live mask ∩ expr live ∩ validity."""
    mask = table.row_mask() if not v.is_scalar else jnp.ones((1,), jnp.bool_)
    if v.live is not None:
        mask = mask & v.live
    return mask, _and_valid(mask, v.validity) if v.validity is not None else mask


def _scalar(dtype, data, valid=None, sdict=None) -> Val:
    data = jnp.reshape(data, (1,))
    validity = None if valid is None else jnp.reshape(valid, (1,))
    return Val(dtype, data, validity, sdict, True)


def _float_dt(dt):
    return Float32 if dt == Float32 else Float64


def _eval_agg(e: Expr, v: Val, table: Table) -> Val:
    agg = e.attrs["agg"]
    live, mask = _agg_mask(v, table)
    dt = v.dtype
    x = v.data

    if agg == "len":
        return _scalar(UInt32, jnp.sum(live).astype(jnp.uint32))
    if agg == "count":
        return _scalar(UInt32, jnp.sum(mask).astype(jnp.uint32))
    if agg == "null_count":
        return _scalar(UInt32, jnp.sum(live & ~mask).astype(jnp.uint32))
    if agg in ("any", "all"):
        if not dt.is_bool:
            raise InvalidOperationError(f"{agg} on {dt!r}")
        if agg == "any":
            return _scalar(Boolean, jnp.any(x & mask))
        return _scalar(Boolean, jnp.all(jnp.where(mask, x, True)))
    if agg == "sum":
        if dt.is_bool:
            return _scalar(UInt32, jnp.sum(x & mask).astype(jnp.uint32))
        acc = _acc_dtype(dt)
        s = jnp.sum(jnp.where(mask, x, 0).astype(acc))
        out_dt = meta.output_dtype(e, table.schema) if False else _sum_dtype(dt)
        return _scalar(out_dt, s.astype(_stor(out_dt)))
    if agg == "product":
        s = jnp.prod(jnp.where(mask, x, 1))
        return _scalar(dt, s)
    if agg == "mean":
        n = jnp.sum(mask)
        acc = _acc_dtype(dt)
        s = jnp.sum(jnp.where(mask, x, 0).astype(acc))
        out_dt = _float_dt(dt) if not (isinstance(dt, (Datetime, Duration)) or dt == Date) else dt
        mean = s / jnp.maximum(n, 1)
        if isinstance(dt, (Datetime, Duration)) or dt == Date:
            return _scalar(out_dt, mean.astype(x.dtype), n > 0)
        return _scalar(out_dt, mean.astype(_stor(out_dt)), n > 0)
    if agg in ("min", "max"):
        n = jnp.sum(mask)
        if dt.is_string:
            big = jnp.int32(np.iinfo(np.int32).max)
            if agg == "min":
                r = jnp.min(jnp.where(mask, x, big))
            else:
                r = jnp.max(jnp.where(mask, x, -1))
            return _scalar(dt, r, n > 0, v.sdict)
        lo, hi = _type_bounds(x.dtype)
        if agg == "min":
            r = jnp.min(jnp.where(mask, x, hi))
        else:
            r = jnp.max(jnp.where(mask, x, lo))
        return _scalar(dt, r, n > 0)
    if agg in ("var", "std"):
        ddof = e.attrs.get("ddof", 1)
        n = jnp.sum(mask)
        acc = _acc_dtype(_float_dt(dt))
        xm = jnp.where(mask, x, 0).astype(acc)
        s = jnp.sum(xm)
        m = s / jnp.maximum(n, 1)
        ss = jnp.sum(jnp.where(mask, (x.astype(acc) - m) ** 2, 0))
        var = ss / jnp.maximum(n - ddof, 1)
        out = jnp.sqrt(var) if agg == "std" else var
        out_dt = _float_dt(dt)
        return _scalar(out_dt, out.astype(_stor(out_dt)), n > ddof)
    if agg in ("first", "last"):
        n = jnp.sum(live)
        if agg == "first":
            idx = jnp.argmax(live)
        else:
            cap = x.shape[0]
            idx = cap - 1 - jnp.argmax(live[::-1])
        val = x[idx]
        valid = (n > 0)
        if v.validity is not None:
            valid = valid & v.validity[idx]
        return _scalar(dt, val, valid, v.sdict)
    if agg in ("arg_min", "arg_max"):
        lo, hi = _type_bounds(x.dtype) if not dt.is_string else \
            (jnp.int32(-1), jnp.int32(np.iinfo(np.int32).max))
        filler = hi if agg == "arg_min" else lo
        sel = jnp.where(mask, x, filler)
        idx = jnp.argmin(sel) if agg == "arg_min" else jnp.argmax(sel)
        # position among live rows
        pos = jnp.sum(live & (jnp.arange(x.shape[0]) < idx)).astype(jnp.uint32)
        return _scalar(UInt32, pos, jnp.sum(mask) > 0)
    if agg in ("median", "quantile"):
        q = 0.5 if agg == "median" else float(e.attrs["q"])
        interp = "linear" if agg == "median" else e.attrs.get("interpolation", "nearest")
        return _quantile(v, mask, q, interp, dt)
    if agg == "n_unique":
        return _n_unique(v, live, mask, dt)
    if agg == "entropy":
        import math
        base = float(e.attrs.get("base", math.e))
        normalize = bool(e.attrs.get("normalize", True))
        fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        xf = jnp.where(mask, x, 0).astype(fdt)
        if normalize:
            s = jnp.sum(xf)
            p = xf / jnp.where(s == 0, 1, s)
        else:
            p = xf
        term = jnp.where(mask & (p > 0), p * jnp.log(p), 0.0)
        h = -jnp.sum(term) / math.log(base)
        out_dt = _float_dt(dt)
        return _scalar(out_dt,
                       h.astype(jnp.dtype(storage_numpy_dtype(out_dt))),
                       jnp.sum(mask) > 0)
    if agg == "mode":
        # sort values, length of each equal-run, smallest most-frequent
        from ..ops.keycode import encode_key_words
        vw = encode_key_words(x, mask, False, True)
        words = [(~mask).astype(jnp.uint32)] + list(vw)
        out = jax.lax.sort(tuple(words) + (x, mask.astype(jnp.int32)),
                           num_keys=len(words), is_stable=True)
        sval, pres = out[-2], out[-1].astype(jnp.bool_)
        cap = x.shape[0]
        idx = jnp.arange(cap)
        new_run = idx == 0
        for w in out[:len(words)]:
            new_run = new_run | (w != jnp.roll(w, 1))
        run_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1
        run_len = jax.ops.segment_sum(pres.astype(jnp.int32), run_id,
                                      num_segments=cap)
        rl = jnp.where(pres, run_len[run_id], 0)
        best = jnp.max(rl)
        pos = jnp.min(jnp.where(new_run & pres & (rl == best), idx, cap))
        data = sval[jnp.clip(pos, 0, cap - 1)]
        return _scalar(dt, data, best > 0, v.sdict)
    if agg == "implode":
        from ..ops.nested import implode_all
        packed, lengths, elem_valid, ldt = implode_all(
            x, v.validity, live, dt, v.sdict)
        return Val(ldt, packed, None, v.sdict, True,
                   lengths=lengths, elem_valid=elem_valid)
    if agg == "agg_groups":
        raise InvalidOperationError("agg_groups() outside group_by")
    if agg in ("skew", "kurtosis"):
        # central-moment reductions (reference: polars-compute/src/moment.rs)
        fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        n = jnp.sum(mask).astype(fdt)
        xf = jnp.where(mask, x, 0).astype(fdt)
        m = jnp.sum(xf) / jnp.maximum(n, 1)
        d = jnp.where(mask, x.astype(fdt) - m, 0.0)
        m2 = jnp.sum(d * d) / jnp.maximum(n, 1)
        out_dt = Float64
        if agg == "skew":
            m3 = jnp.sum(d ** 3) / jnp.maximum(n, 1)
            g1 = m3 / jnp.maximum(m2, 1e-300) ** 1.5
            if not e.attrs.get("bias", True):
                g1 = g1 * jnp.sqrt(n * (n - 1)) / jnp.maximum(n - 2, 1)
            return _scalar(out_dt, g1.astype(_stor(out_dt)),
                           (n > (2 if not e.attrs.get("bias", True) else 0))
                           & (m2 > 0))
        m4 = jnp.sum(d ** 4) / jnp.maximum(n, 1)
        g2 = m4 / jnp.maximum(m2 * m2, 1e-300)
        if not e.attrs.get("bias", True):
            g2 = ((n + 1) * g2 - 3 * (n - 1)) * (n - 1) / \
                jnp.maximum((n - 2) * (n - 3), 1) + 3
        if e.attrs.get("fisher", True):
            g2 = g2 - 3.0
        return _scalar(out_dt, g2.astype(_stor(out_dt)),
                       (n > (3 if not e.attrs.get("bias", True) else 0))
                       & (m2 > 0))
    if agg in ("nan_min", "nan_max"):
        n = jnp.sum(mask)
        lo, hi = _type_bounds(x.dtype)
        if agg == "nan_min":
            r = jnp.min(jnp.where(mask, x, hi))
        else:
            r = jnp.max(jnp.where(mask, x, lo))
        if dt.is_float:
            has_nan = jnp.any(mask & jnp.isnan(x))
            r = jnp.where(has_nan, jnp.nan, r)
        return _scalar(dt, r, n > 0)
    if agg in ("bitwise_and", "bitwise_or", "bitwise_xor"):
        if dt.is_bool:
            if agg == "bitwise_and":
                r = jnp.all(jnp.where(mask, x, True))
            elif agg == "bitwise_or":
                r = jnp.any(jnp.where(mask, x, False))
            else:
                r = (jnp.sum(jnp.where(mask, x, False).astype(jnp.int32))
                     % 2).astype(jnp.bool_)
            return _scalar(Boolean, r, jnp.sum(mask) > 0)
        if not dt.is_integer:
            raise InvalidOperationError(f"{agg} on {dt!r}")
        ones = jnp.array(-1, x.dtype) if dt.is_signed_integer else \
            jnp.array(np.iinfo(np.dtype(str(x.dtype))).max, x.dtype)
        if agg == "bitwise_and":
            fn, ident = jax.lax.bitwise_and, ones
        elif agg == "bitwise_or":
            fn, ident = jax.lax.bitwise_or, jnp.array(0, x.dtype)
        else:
            fn, ident = jax.lax.bitwise_xor, jnp.array(0, x.dtype)
        r = jax.lax.reduce(jnp.where(mask, x, ident), ident, fn, (0,))
        return _scalar(dt, r, jnp.sum(mask) > 0)
    raise ComputeError(f"unknown aggregation {agg!r}")


def _acc_dtype(dt: DataType):
    if dt.is_float:
        return _stor(Float64)  # f64 on CPU; storage policy may make this f32
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


def _sum_dtype(dt: DataType) -> DataType:
    if dt.is_integer:
        return Int64 if dt.is_signed_integer or dt.bit_width() < 64 else dt
    return dt


def _type_bounds(jdt):
    if jnp.issubdtype(jdt, jnp.floating):
        return jnp.array(-jnp.inf, jdt), jnp.array(jnp.inf, jdt)
    info = jnp.iinfo(jdt)
    return jnp.array(info.min, jdt), jnp.array(info.max, jdt)


def _quantile(v: Val, mask, q: float, interp: str, dt) -> Val:
    x = v.data
    n = jnp.sum(mask)
    lo, hi = _type_bounds(x.dtype)
    # sort invalid to the back
    keys = jnp.where(mask, x, hi)
    s = jnp.sort(keys)
    pos = q * (n.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32) - 1)
    out_dt = _float_dt(dt) if not (isinstance(dt, (Datetime, Duration)) or dt == Date) else dt
    if interp == "linear":
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.ceil(pos).astype(jnp.int32)
        frac = pos - i0
        val = s[jnp.maximum(i0, 0)] * (1 - frac) + s[jnp.maximum(i1, 0)] * frac
    elif interp == "lower":
        val = s[jnp.maximum(jnp.floor(pos).astype(jnp.int32), 0)]
    elif interp == "higher":
        val = s[jnp.maximum(jnp.ceil(pos).astype(jnp.int32), 0)]
    elif interp == "midpoint":
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.ceil(pos).astype(jnp.int32)
        val = (s[jnp.maximum(i0, 0)] + s[jnp.maximum(i1, 0)]) / 2
    else:  # nearest
        val = s[jnp.maximum(jnp.round(pos).astype(jnp.int32), 0)]
    if isinstance(dt, (Datetime, Duration)) or dt == Date:
        return _scalar(out_dt, val.astype(x.dtype), n > 0)
    return _scalar(out_dt, val.astype(_stor(out_dt)), n > 0)


def _n_unique(v: Val, live, mask, dt) -> Val:
    x = v.data
    # sort (valid-first, then value); boundaries within the valid prefix
    invalid = (~mask).astype(jnp.int32)
    sk, sx = jax.lax.sort((invalid, x), num_keys=2, is_stable=True)
    nvalid = jnp.sum(mask)
    idx = jnp.arange(x.shape[0])
    newgrp = (idx == 0) | (sx != jnp.roll(sx, 1)) | (sk != jnp.roll(sk, 1))
    distinct_valid = jnp.sum(newgrp & (idx < nvalid))
    has_null = jnp.any(live & ~mask)
    return _scalar(UInt32, (distinct_valid + has_null).astype(jnp.uint32))


# ---------------------------------------------------------------------------
# window (order-dependent) ops
# ---------------------------------------------------------------------------

def _eval_window(e: Expr, v: Val, fillv: Val, table: Table,
                 byv: Optional[Val] = None) -> Val:
    op = e.attrs["op"]
    if v.is_scalar:
        raise InvalidOperationError(f"window op {op} on scalar")
    mask, perm, inv, count = _live_order(table)
    x = v.data[perm]
    xv = v.valid_or_true()[perm] & (jnp.arange(x.shape[0]) < count)
    cap = x.shape[0]
    idx = jnp.arange(cap)
    dt = v.dtype

    def back(data, validity, out_dt=None, sdict=None):
        out_dt = out_dt or dt
        return Val(out_dt, data[inv], validity[inv] if validity is not None else None,
                   sdict if sdict is not None else v.sdict, False, v.live)

    if op == "reverse":
        # reverse live prefix
        src = jnp.where(idx < count, count - 1 - idx, idx)
        return back(x[src], (v.valid_or_true()[perm])[src])

    if op == "rle_id":
        # run index of consecutive equal values (reference:
        # `polars-stream/src/nodes/rle_id` capability)
        prev = jnp.roll(x, 1)
        prev_v = jnp.roll(xv, 1)
        change = (idx == 0) | (x != prev) | (xv != prev_v)
        rid = jnp.cumsum(change.astype(jnp.uint32)) - 1
        return back(rid, None, UInt32)

    if op in ("peak_min", "peak_max"):
        lo_b, hi_b = _type_bounds(x.dtype)
        pad = hi_b if op == "peak_min" else lo_b
        xa = jnp.where((idx < count) & xv, x, pad)
        prev = jnp.where(idx > 0, jnp.roll(xa, 1), pad)
        nxt = jnp.where(idx < count - 1, jnp.roll(xa, -1), pad)
        if op == "peak_min":
            out = (xa < prev) & (xa < nxt)
        else:
            out = (xa > prev) & (xa > nxt)
        out = out & xv & (idx < count)
        return back(out, None, Boolean)

    if op == "shift":
        n = e.attrs["n"]
        src = idx - n
        inb = (src >= 0) & (src < count)
        srcc = jnp.clip(src, 0, cap - 1)
        data = x[srcc]
        validity = inb & xv[srcc]
        if fillv.dtype != Null:
            fv = cast_val(fillv, dt)
            data = jnp.where(inb, data, jnp.broadcast_to(fv.data, (cap,)))
            validity = jnp.where(inb, validity, True)
        return back(data, validity)

    if op in ("diff", "pct_change"):
        n = e.attrs["n"]
        src = idx - n
        inb = (src >= 0) & (src < count)
        srcc = jnp.clip(src, 0, cap - 1)
        prev = x[srcc]
        validity = inb & xv[srcc] & xv
        if op == "diff":
            if dt == Date:
                ms = (x.astype(jnp.int64) - prev.astype(jnp.int64)) * 86_400_000
                return back(ms, validity, Duration("ms"))
            if isinstance(dt, Datetime):
                return back(x - prev, validity, Duration(dt.time_unit))
            return back(x - prev, validity)
        out_dt = _float_dt(dt)
        f = x.astype(_stor(out_dt))
        data = f / prev.astype(_stor(out_dt)) - 1.0
        return back(data, validity, out_dt)

    if op in ("cum_sum", "cum_min", "cum_max", "cum_prod", "cum_count"):
        rev = e.attrs.get("reverse", False)
        xx = x[::-1] if rev else x
        vv = xv[::-1] if rev else xv
        if op == "cum_count":
            data = jnp.cumsum(vv.astype(jnp.uint32))
            out = data[::-1] if rev else data
            return back(out, None, UInt32)
        if op == "cum_sum":
            data = jnp.cumsum(jnp.where(vv, xx, 0))
        elif op == "cum_prod":
            data = jnp.cumprod(jnp.where(vv, xx, 1))
        else:
            lo, hi = _type_bounds(x.dtype)
            ident = hi if op == "cum_min" else lo
            fn = jax.lax.cummin if op == "cum_min" else jax.lax.cummax
            data = fn(jnp.where(vv, xx, ident))
        data = data[::-1] if rev else data
        return back(data.astype(x.dtype), v.valid_or_true()[perm])

    if op in ("rolling_sum", "rolling_mean", "rolling_min", "rolling_max",
              "rolling_std", "rolling_var"):
        return _rolling(e, v, x, xv, count, back)

    if op == "ewm_mean":
        return _ewm_mean(e, v, x, xv, back)

    if op == "rank":
        return _rank(e, v, x, xv, count, back)

    if op == "forward_fill" or op == "backward_fill":
        fwd = op == "forward_fill"
        xx = x if fwd else x[::-1]
        vv = xv if fwd else xv[::-1]
        last = jax.lax.cummax(jnp.where(vv, idx, -1))
        has = last >= 0
        data = xx[jnp.maximum(last, 0)]
        validity = has
        if not fwd:
            data, validity = data[::-1], validity[::-1]
        return back(data, validity)

    if op in ("interpolate", "interpolate_by"):
        prev_i = jax.lax.cummax(jnp.where(xv, idx, -1))
        nxt_rev = jax.lax.cummax(jnp.where(xv[::-1], idx, -1))
        next_i = jnp.where(nxt_rev[::-1] >= 0, cap - 1 - nxt_rev[::-1], -1)
        out_dt = _float_dt(dt)
        f = x.astype(_stor(out_dt))
        p, nx = jnp.maximum(prev_i, 0), jnp.maximum(next_i, 0)
        if op == "interpolate_by":
            b = byv.data[perm].astype(_stor(out_dt))
            span = b[nx] - b[p]
            frac = (b - b[p]) / jnp.where(span == 0, 1, span)
        else:
            span = jnp.maximum(nx - p, 1)
            frac = (idx - p) / span
        data = f[p] * (1 - frac) + f[nx] * frac
        validity = (prev_i >= 0) & (next_i >= 0)
        data = jnp.where(xv, f, data)
        validity = validity | xv
        return back(data, validity, out_dt)

    if op == "arg_sort":
        from ..ops.keycode import encode_key_words
        desc = e.attrs.get("descending", False)
        nl = e.attrs.get("nulls_last", False)
        live = idx < count
        dead = (~live).astype(jnp.uint32)
        words = [dead] + encode_key_words(x, xv, desc, nl)
        out = jax.lax.sort(tuple(words) + (idx.astype(jnp.uint32),),
                           num_keys=len(words), is_stable=True)
        return back(out[-1], None, UInt32)

    if op == "rolling_quantile":
        return _rolling_quantile(e, v, x, xv, count, back)

    if op in ("rolling_skew", "rolling_kurtosis"):
        return _rolling_moments(e, v, x, xv, count, back)

    if op == "rolling_map":
        return _rolling_map_host(e, v, x, xv, count, back)

    if op == "rolling_rank":
        w = e.attrs["window_size"]
        min_p = e.attrs.get("min_samples") or w
        desc = e.attrs.get("descending", False)
        method = e.attrs.get("method", "average")
        lo_b, hi_b = _type_bounds(x.dtype)
        m, mv = _win_stack(x, xv, w, hi_b)
        cur = x[:, None]
        if desc:
            lt = (m > cur) & mv
            eq = (m == cur) & mv
        else:
            lt = (m < cur) & mv
            eq = (m == cur) & mv
        n_lt = jnp.sum(lt, axis=1)
        n_eq = jnp.sum(eq, axis=1)  # includes self
        cnt = jnp.sum(mv, axis=1)
        validity = (cnt >= min_p) & (idx < count) & xv
        if method == "min":
            r = (n_lt + 1).astype(jnp.float64)
        elif method == "max":
            r = (n_lt + n_eq).astype(jnp.float64)
        else:  # average
            r = n_lt + (n_eq + 1) / 2.0
        return back(r.astype(_stor(Float64)), validity, Float64)

    if op in ("ewm_std", "ewm_var"):
        return _ewm_var_std(e, v, x, xv, back)

    if op == "ewm_mean_by":
        half_life = e.attrs["half_life"]
        if isinstance(half_life, str):
            from ..ops.temporal import parse_every, UNIT_PER_SECOND
            kind, ns = parse_every(half_life)
            if kind != "fixed":
                raise InvalidOperationError(
                    "ewm_mean_by: month-based half_life unsupported")
            bdt = byv.dtype
            per_s = UNIT_PER_SECOND[bdt.time_unit] \
                if isinstance(bdt, (Datetime, Duration)) else None
            if per_s is not None:
                hl = ns * per_s / 1_000_000_000
            elif bdt == Date:
                hl = ns / (86_400 * 1_000_000_000)
            else:
                hl = float(ns)
        else:
            hl = float(half_life)
        out_dt = _float_dt(dt)
        stor = _stor(out_dt)
        b = byv.data[perm].astype(jnp.float64 if jax.config.jax_enable_x64
                                  else jnp.float32)
        prev_b = jnp.where(idx > 0, jnp.roll(b, 1), b)
        dtv = jnp.maximum(b - prev_b, 0.0)
        alpha_t = 1.0 - jnp.exp2(-dtv / hl)
        f = x.astype(stor)
        # y_t = (1-a_t) y_{t-1} + a_t x_t ; nulls hold the previous state
        A = jnp.where(xv, (1.0 - alpha_t).astype(stor), 1.0)
        first = jnp.cumsum(xv.astype(jnp.int32)) == 1
        A = jnp.where(first & xv, 0.0, A)
        B = jnp.where(xv, jnp.where(first, f,
                                    (alpha_t.astype(stor)) * f), 0.0)

        from ..ops.groupby import _seg_scan_doubling_multi

        def comb(prev, cur):
            (Ap, Bp), (Aq, Bq) = prev, cur
            return (Ap * Aq, Bp * Aq + Bq)

        _, y = _seg_scan_doubling_multi(
            [A, B], jnp.zeros(A.shape[0], jnp.int32), comb)
        seen = jnp.cumsum(xv.astype(jnp.int32)) > 0
        return back(y, xv & seen, out_dt)

    if op in ("rolling_sum_by", "rolling_mean_by", "rolling_min_by",
              "rolling_max_by", "rolling_std_by", "rolling_var_by",
              "rolling_quantile_by", "rolling_rank_by"):
        return _rolling_by(e, v, x, xv, count, back, byv, perm)

    raise ComputeError(f"unknown window op {op!r}")


def _win_stack(x, xv, w, pad):
    """(cap, w) matrix: row i = trailing window x[i-w+1 .. i], invalid or
    out-of-range slots = pad. Static w shifts — XLA fuses to w rolls."""
    cap = x.shape[0]
    idx = jnp.arange(cap)
    cols, colsv = [], []
    for k in range(w):
        src = idx - k
        inb = src >= 0
        xs = x[jnp.clip(src, 0, cap - 1)]
        vs = xv[jnp.clip(src, 0, cap - 1)] & inb
        cols.append(jnp.where(vs, xs, pad))
        colsv.append(vs)
    return jnp.stack(cols, axis=1), jnp.stack(colsv, axis=1)


def _rolling_quantile(e: Expr, v: Val, x, xv, count, back) -> Val:
    w = e.attrs["window_size"]
    min_p = e.attrs.get("min_samples") or w
    q = float(e.attrs["q"])
    interp = e.attrs.get("interpolation", "nearest")
    dt = v.dtype
    cap = x.shape[0]
    out_dt = _float_dt(dt)
    stor = _stor(out_dt)
    _, hi_b = _type_bounds(x.dtype)
    m, mv = _win_stack(x, xv, w, hi_b)
    s = jnp.sort(m.astype(stor), axis=1)
    cnt = jnp.sum(mv, axis=1)
    pos = q * (cnt.astype(stor) - 1)
    validity = (cnt >= min_p) & (jnp.arange(cap) < count)

    def at(p):
        return jnp.take_along_axis(
            s, jnp.clip(p, 0, w - 1)[:, None], axis=1)[:, 0]

    if interp == "linear":
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.ceil(pos).astype(jnp.int32)
        frac = pos - i0
        data = at(i0) * (1 - frac) + at(i1) * frac
    elif interp == "lower":
        data = at(jnp.floor(pos).astype(jnp.int32))
    elif interp == "higher":
        data = at(jnp.ceil(pos).astype(jnp.int32))
    elif interp == "midpoint":
        data = (at(jnp.floor(pos).astype(jnp.int32))
                + at(jnp.ceil(pos).astype(jnp.int32))) / 2
    else:  # nearest
        data = at(jnp.round(pos).astype(jnp.int32))
    return back(data, validity, out_dt)


def _rolling_moments(e: Expr, v: Val, x, xv, count, back) -> Val:
    op = e.attrs["op"]
    w = e.attrs["window_size"]
    min_p = e.attrs.get("min_samples") or w
    cap = x.shape[0]
    out_dt = Float64
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    f = jnp.where(xv, x, 0).astype(fdt)
    n = _roll_win(xv.astype(fdt), w, "add")
    s1 = _roll_win(f, w, "add")
    s2 = _roll_win(f * f, w, "add")
    s3 = _roll_win(f * f * f, w, "add")
    nn = jnp.maximum(n, 1)
    m = s1 / nn
    m2 = jnp.maximum(s2 / nn - m * m, 0.0)
    validity = (n >= min_p) & (jnp.arange(cap) < count) & (m2 > 0)
    if op == "rolling_skew":
        m3 = s3 / nn - 3 * m * s2 / nn + 2 * m ** 3
        g = m3 / jnp.maximum(m2, 1e-300) ** 1.5
        if not e.attrs.get("bias", True):
            g = g * jnp.sqrt(nn * (nn - 1)) / jnp.maximum(nn - 2, 1)
            validity = validity & (n > 2)
        return back(g.astype(_stor(out_dt)), validity, out_dt)
    s4 = _roll_win(f ** 4, w, "add")
    m4 = s4 / nn - 4 * m * s3 / nn + 6 * m * m * s2 / nn - 3 * m ** 4
    g = m4 / jnp.maximum(m2 * m2, 1e-300)
    if not e.attrs.get("bias", True):
        g = ((nn + 1) * g - 3 * (nn - 1)) * (nn - 1) / \
            jnp.maximum((nn - 2) * (nn - 3), 1) + 3
        validity = validity & (n > 3)
    if e.attrs.get("fisher", True):
        g = g - 3.0
    return back(g.astype(_stor(out_dt)), validity, out_dt)


def _rolling_map_host(e: Expr, v: Val, x, xv, count, back) -> Val:
    """Host UDF over each window (reference: Expr.rolling_map — documented
    slow path there too). Unfusable; runs eagerly."""
    w = e.attrs["window_size"]
    min_p = e.attrs.get("min_samples") or w
    fn = e.attrs["fn"]
    from ..api.series import Series
    xs = np.asarray(x)
    vs = np.asarray(xv)
    cnt = int(np.asarray(count))
    data = np.zeros(xs.shape[0], dtype=np.float64)
    valid = np.zeros(xs.shape[0], dtype=bool)
    for i in range(cnt):
        lo = max(0, i - w + 1)
        vals = [xs[j].item() if vs[j] else None for j in range(lo, i + 1)]
        n_ok = sum(1 for u in vals if u is not None)
        if n_ok < min_p:
            continue
        r = fn(Series("", vals))
        if r is not None:
            data[i] = float(r)
            valid[i] = True
    return back(jnp.asarray(data), jnp.asarray(valid), Float64)


def _ewm_var_std(e: Expr, v: Val, x, xv, back) -> Val:
    """EW variance via weighted-moment associative scans (reference:
    polars-compute/src/ewm/variance.rs semantics)."""
    op = e.attrs["op"]
    alpha = float(e.attrs["alpha"])
    adjust = e.attrs.get("adjust", True)
    bias = e.attrs.get("bias", False)
    min_p = e.attrs.get("min_samples", 1)
    out_dt = _float_dt(v.dtype)
    stor = _stor(out_dt)
    f = x.astype(stor)
    d = jnp.where(xv, 1.0 - alpha, 1.0).astype(stor)
    d2 = d * d

    # scans: sum w, sum w^2, sum w x, sum w x^2 with decay d (w) / d2 (w^2)
    from ..ops.groupby import _seg_scan_doubling_multi
    _zero_gid = jnp.zeros(f.shape[0], jnp.int32)

    def scan(decay, contrib):
        def c2(prev, cur):
            (Ap, Sp), (Aq, Sq) = prev, cur
            return (Ap * Aq, Sp * Aq + Sq)
        _, s = _seg_scan_doubling_multi(
            [decay, jnp.where(xv, contrib, 0.0)], _zero_gid, c2)
        return s

    one = jnp.ones_like(f)
    sw = scan(d, one)
    sw2 = scan(d2, one)
    swx = scan(d, f)
    swx2 = scan(d, f * f)
    mean = swx / jnp.maximum(sw, 1e-300)
    var = swx2 / jnp.maximum(sw, 1e-300) - mean * mean
    var = jnp.maximum(var, 0.0)
    if not bias:
        denom = sw * sw - sw2
        var = var * (sw * sw) / jnp.where(denom <= 0, 1.0, denom)
        var = jnp.where(denom <= 0, 0.0, var)
    cnt = jnp.cumsum(xv.astype(jnp.int32))
    validity = xv & (cnt >= min_p)
    data = jnp.sqrt(var) if op == "ewm_std" else var
    return back(data.astype(stor), validity, out_dt)


def _rolling_by_bounds(e: Expr, b, bdt, live, gstart=None, gend=None):
    """Per-row range-window bounds [lo, hi) over a sorted `by` column.
    Value-based on both ends (the reference consumes duplicate `by`
    values past the current row: polars-time/src/windows/group_by.rs:
    314-319) with `closed` edge modes. With gstart/gend the search is
    segmented per group (for `.over()` partitions)."""
    from ..ops.range_agg import segmented_searchsorted
    from ..ops.temporal import parse_every, UNIT_PER_SECOND
    period = e.attrs["period"]
    months = 0
    span = 0
    if isinstance(period, str):
        kind, ns = parse_every(period)
        if kind == "months":
            months = ns
        elif isinstance(bdt, (Datetime, Duration)):
            span = ns // (1_000_000_000 // UNIT_PER_SECOND[bdt.time_unit]) \
                if bdt.time_unit != "ns" else ns
        elif bdt == Date:
            span = ns // (86_400 * 1_000_000_000)
        else:
            span = ns
    else:
        span = int(period)
    bi = b.astype(jnp.int64) if not jnp.issubdtype(b.dtype, jnp.floating) \
        else b
    # by must be sorted ascending within each segment; dead rows are
    # pinned to the top so their windows resolve empty/irrelevant
    _, hi_bnd = _type_bounds(bi.dtype)
    bs = jnp.where(live, bi, hi_bnd)
    if months:
        # calendar window: lower bound = by_i minus N civil months
        if not (isinstance(bdt, Datetime) or bdt == Date):
            raise InvalidOperationError(
                f"rolling_*_by: month-based period {period!r} needs a "
                f"date/datetime `by` column, got {bdt}")
        from ..ops.temporal_window import _add_months_units
        mt = _add_months_units(bi, -months, bdt)
        target = jnp.where(live, mt, bs)
    else:
        target = bs - span
    closed = e.attrs.get("closed") or "right"
    lo_side = "left" if closed in ("left", "both") else "right"
    hi_side = "right" if closed in ("right", "both") else "left"
    cap = bs.shape[0]
    if gstart is None:
        idx = jnp.arange(cap)
        count = jnp.sum(live.astype(jnp.int32))
        lo = jnp.searchsorted(bs, target, side=lo_side)
        hi = jnp.minimum(jnp.searchsorted(bs, bs, side=hi_side), count)
    else:
        lo = segmented_searchsorted(bs, gstart, gend, target, side=lo_side)
        hi = segmented_searchsorted(bs, gstart, gend, bs, side=hi_side)
    return lo, hi


def _rolling_by(e: Expr, v: Val, x, xv, count, back, byv, perm) -> Val:
    """Range-windowed rolling over a sorted `by` column: window for row i =
    rows j with by_j in (by_i - period, by_i]. Prefix sums / sparse-table
    range queries — no per-window loops (reference:
    polars-time/src/group_by/rolling semantics)."""
    cap = x.shape[0]
    idx = jnp.arange(cap)
    live = idx < count
    lo, hi = _rolling_by_bounds(e, byv.data[perm], byv.dtype, live)
    return _range_window_reduce(e, v, x, xv, back, lo, hi, idx, live)


def _range_window_reduce(e: Expr, v: Val, x, xv, back, lo, hi, idx,
                         live) -> Val:
    """Reduce per-row ranges [lo, hi) for every rolling_*_by op."""
    from ..ops.range_agg import build_sparse, range_query, prefix_range_sum
    op = e.attrs["op"]
    min_p = e.attrs.get("min_samples") or 1
    dt = v.dtype
    cnt = prefix_range_sum(xv.astype(jnp.int32), lo, hi)
    validity = (cnt >= min_p) & live
    if op in ("rolling_quantile_by", "rolling_rank_by"):
        return _rolling_order_by(e, v, x, xv, back, lo, hi, idx, cnt,
                                 validity)
    if op in ("rolling_min_by", "rolling_max_by"):
        knd = "min" if op == "rolling_min_by" else "max"
        lo_b, hi_b = _type_bounds(x.dtype)
        pad = hi_b if knd == "min" else lo_b
        levels = build_sparse(jnp.where(xv, x, pad), knd)
        data = range_query(levels, lo, hi, knd, pad)
        return back(data, validity)
    acc = _acc_dtype(_float_dt(dt)) if dt.is_float else _acc_dtype(dt)
    s = prefix_range_sum(jnp.where(xv, x, 0).astype(acc), lo, hi)
    if op == "rolling_sum_by":
        return back(s.astype(x.dtype), validity)
    out_dt = _float_dt(dt)
    stor = _stor(out_dt)
    n = jnp.maximum(cnt, 1)
    if op == "rolling_mean_by":
        return back((s / n).astype(stor), validity, out_dt)
    s2 = prefix_range_sum(jnp.where(xv, x.astype(acc) ** 2, 0), lo, hi)
    ddof = e.attrs.get("ddof", 1)
    var = (s2 - s * s / n) / jnp.maximum(n - ddof, 1)
    var = jnp.maximum(var, 0)
    validity = validity & (cnt > ddof)
    if op == "rolling_var_by":
        return back(var.astype(stor), validity, out_dt)
    return back(jnp.sqrt(var).astype(stor), validity, out_dt)


def _rolling_order_by(e: Expr, v: Val, x, xv, back, lo, hi, idx, cnt,
                      validity) -> Val:
    """Order statistics over per-row ranges [lo, hi) via a wavelet tree
    in rank space (quantile/median/rank for range windows — the
    reference's per-window quantile loops in
    polars-compute/src/rolling/quantile_filter.rs don't map to XLA)."""
    from ..ops.wavelet import (build_wavelet, wavelet_count_lt,
                               wavelet_select)
    from ..ops.keycode import encode_orderable
    op = e.attrs["op"]
    dt = v.dtype
    cap = x.shape[0]
    desc = e.attrs.get("descending", False)
    u = encode_orderable(x, desc)
    maxk = ~jnp.zeros((), u.dtype)  # all-ones: nulls/dead sort last
    u = jnp.where(xv, u, maxk)
    order = jnp.argsort(u, stable=True)
    # inverse permutation via sort (TPU scatters serialize)
    _, rank = jax.lax.sort(
        (order.astype(jnp.int32), jnp.arange(cap, dtype=jnp.int32)),
        num_keys=1)
    tables = build_wavelet(rank)
    # empty windows (dead rows, closed='left'/'none') get a dummy
    # non-empty range; their outputs are masked invalid anyway
    empty = hi <= lo
    slo = jnp.where(empty, idx, lo).astype(jnp.int32)
    shi = jnp.where(empty, idx + 1, hi).astype(jnp.int32)
    if op == "rolling_quantile_by":
        q = float(e.attrs["q"])
        interp = e.attrs.get("interpolation", "nearest")
        out_dt = _float_dt(dt)
        stor = _stor(out_dt)
        sorted_x = x[order].astype(stor)
        pos = q * (jnp.maximum(cnt, 1).astype(stor) - 1)

        def at(kk):
            kk = jnp.clip(kk, 0, jnp.maximum(shi - slo - 1, 0))
            return sorted_x[wavelet_select(tables, slo, shi, kk)]

        if interp == "linear":
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = (pos - i0).astype(stor)
            data = at(i0) * (1 - frac) + at(i0 + 1) * frac
            data = jnp.where(frac > 0, data, at(i0))
        elif interp == "lower":
            data = at(jnp.floor(pos).astype(jnp.int32))
        elif interp == "higher":
            data = at(jnp.ceil(pos).astype(jnp.int32))
        elif interp == "midpoint":
            data = (at(jnp.floor(pos).astype(jnp.int32))
                    + at(jnp.ceil(pos).astype(jnp.int32))) / 2
        else:  # nearest
            data = at(jnp.round(pos).astype(jnp.int32))
        return back(data, validity, out_dt)
    # rolling_rank_by: rank of the current value within its window;
    # value ties occupy the contiguous rank interval [first, last)
    method = e.attrs.get("method", "average")
    u_sorted = u[order]
    first = jnp.searchsorted(u_sorted, u, side="left").astype(jnp.int32)
    last = jnp.searchsorted(u_sorted, u, side="right").astype(jnp.int32)
    n_lt = wavelet_count_lt(tables, slo, shi, first)
    n_le = wavelet_count_lt(tables, slo, shi, last)
    n_eq = n_le - n_lt
    validity = validity & xv
    if method == "min":
        r = (n_lt + 1).astype(jnp.float64)
    elif method == "max":
        r = (n_lt + n_eq).astype(jnp.float64)
    elif method == "dense":
        # distinct smaller values in the window: count via select-walk is
        # costly; approximate exactly with lt-count of distinct ranks is
        # not available -> use min-rank semantics over distinct values
        raise InvalidOperationError(
            "rolling_rank_by: method='dense' unsupported")
    else:  # average
        r = n_lt + (n_eq + 1) / 2.0
    return back(r.astype(_stor(Float64)), validity, Float64)


def _rolling(e: Expr, v: Val, x, xv, count, back) -> Val:
    op = e.attrs["op"]
    w = e.attrs["window_size"]
    min_p = e.attrs.get("min_samples") or w
    dt = v.dtype
    cap = x.shape[0]
    cnt = _roll_win(xv.astype(jnp.int32), w, "add")
    validity = (cnt >= min_p) & (jnp.arange(cap) < count)
    if op in ("rolling_min", "rolling_max"):
        lo, hi = _type_bounds(x.dtype)
        if op == "rolling_min":
            data = _roll_win(jnp.where(xv, x, hi), w, "min")
        else:
            data = _roll_win(jnp.where(xv, x, lo), w, "max")
        return back(data, validity)
    acc = _acc_dtype(_float_dt(dt)) if dt.is_float else _acc_dtype(dt)
    s = _roll_win(jnp.where(xv, x, 0).astype(acc), w, "add")
    if op == "rolling_sum":
        return back(s.astype(x.dtype), validity)
    out_dt = _float_dt(dt)
    n = jnp.maximum(cnt, 1)
    if op == "rolling_mean":
        return back((s / n).astype(_stor(out_dt)), validity, out_dt)
    s2 = _roll_win(jnp.where(xv, x.astype(acc) ** 2, 0), w, "add")
    ddof = e.attrs.get("ddof", 1)
    var = (s2 - s * s / n) / jnp.maximum(n - ddof, 1)
    var = jnp.maximum(var, 0)
    validity = validity & (cnt > ddof)
    if op == "rolling_var":
        return back(var.astype(_stor(out_dt)), validity, out_dt)
    return back(jnp.sqrt(var).astype(_stor(out_dt)), validity, out_dt)


def _roll_win(x, w, kind):
    """Trailing-window reduction via lax.reduce_window (VPU-friendly)."""
    init = {"add": jnp.array(0, x.dtype),
            "min": _type_bounds(x.dtype)[1],
            "max": _type_bounds(x.dtype)[0]}[kind]
    fn = {"add": jax.lax.add, "min": jax.lax.min, "max": jax.lax.max}[kind]
    return jax.lax.reduce_window(x, init, fn, (w,), (1,), [(w - 1, 0)])


def _ewm_mean(e: Expr, v: Val, x, xv, back) -> Val:
    alpha = e.attrs["alpha"]
    min_p = e.attrs.get("min_samples", 1)
    out_dt = _float_dt(v.dtype)
    f = x.astype(_stor(out_dt))
    one = jnp.ones_like(f)
    decay = jnp.where(xv, 1.0 - alpha, 1.0).astype(f.dtype)
    bn = jnp.where(xv, f, 0.0)
    bd = jnp.where(xv, one, 0.0)

    from ..ops.groupby import _seg_scan_doubling_multi

    def comb(prev, cur):
        (Aa, Na, Da), (Ab, Nb, Db) = prev, cur
        return (Aa * Ab, Na * Ab + Nb, Da * Ab + Db)

    A, N, D = _seg_scan_doubling_multi(
        [decay, bn, bd], jnp.zeros(f.shape[0], jnp.int32), comb)
    cnt = jnp.cumsum(xv.astype(jnp.int32))
    data = N / jnp.maximum(D, 1e-300 if f.dtype == jnp.float64 else 1e-30)
    validity = xv & (cnt >= min_p)
    return back(data, validity, out_dt)


def _rank(e: Expr, v: Val, x, xv, count, back) -> Val:
    method = e.attrs.get("method", "average")
    desc = e.attrs.get("descending", False)
    cap = x.shape[0]
    idx = jnp.arange(cap)
    # sort: invalid last, then value
    lo, hi = _type_bounds(x.dtype) if not v.dtype.is_string else \
        (jnp.int32(np.iinfo(np.int32).min), jnp.int32(np.iinfo(np.int32).max))
    key = jnp.where(xv, x, hi)
    if desc:
        key = jnp.where(xv, _neg_key(x), hi)
    sk, si = jax.lax.sort((key, idx.astype(jnp.int32)), num_keys=1, is_stable=True)
    newg = (idx == 0) | (sk != jnp.roll(sk, 1))
    start = jax.lax.cummax(jnp.where(newg, idx, 0))
    gid = jnp.cumsum(newg.astype(jnp.int32))
    # end of group: next group's start - 1 (via reverse cummin of starts)
    nxt = jnp.where(newg, idx, cap)
    end_rev = jax.lax.cummin(nxt[::-1])[::-1]
    # end_rev gives start of current group; need next group's start:
    nxt_start = jnp.concatenate([start[1:], jnp.array([cap])])
    # recompute: positions where next is new group
    is_last = jnp.concatenate([newg[1:], jnp.array([True])])
    gend = jax.lax.cummin(jnp.where(is_last, idx, cap)[::-1])[::-1]
    if method == "ordinal":
        r = (idx + 1).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    elif method == "min":
        r = (start + 1).astype(jnp.float32)
    elif method == "max":
        r = (gend + 1).astype(jnp.float32)
    elif method == "dense":
        r = gid.astype(jnp.float32)
    else:  # average
        r = (start + gend).astype(jnp.float32) / 2 + 1
    # writeback via sort (TPU scatters serialize)
    _, out = jax.lax.sort((si.astype(jnp.int32), r), num_keys=1)
    from ..dtypes import UInt32 as U32, Float64 as F64
    out_dt = F64 if method == "average" else U32
    # validity: null stays null
    validity = xv
    data = out.astype(_stor(out_dt))
    return back(data, validity, out_dt)


def _neg_key(x):
    if jnp.issubdtype(x.dtype, jnp.floating):
        return -x
    return -x  # ints: negation ok except INT_MIN edge; acceptable


# ---------------------------------------------------------------------------
# str / dt namespaces
# ---------------------------------------------------------------------------

def _eval_list_eval(e: Expr, v: Val, table: Table, ctx: str) -> Val:
    """`.list.eval(expr)`: evaluate an elementwise expr over the flattened
    (capacity*width) element array and reshape back — the padded layout
    makes per-element eval one vectorized pass, no per-list loops."""
    from ..dtypes import List as ListT
    if v.lengths is None:
        raise InvalidOperationError(f".list.eval on non-list {v.dtype!r}")
    inner_e = e.children[1]
    while inner_e.kind in ("alias", "name_keep"):
        inner_e = inner_e.children[0]
    if inner_e.kind == "expr_filter" and \
            meta.is_elementwise(inner_e.children[0]) and \
            meta.is_elementwise(inner_e.children[1]):
        # pl.element().filter(pred): evaluate value+pred per element,
        # compact kept elements to the row front (same one-sort scheme
        # as list.filter)
        val_l = _eval_list_eval(
            Expr("list_eval", (e.children[0], inner_e.children[0])),
            v, table, ctx)
        pred_l = _eval_list_eval(
            Expr("list_eval", (e.children[0], inner_e.children[1])),
            v, table, ctx)
        cap, W = val_l.data.shape
        jidx = jnp.arange(W)[None, :]
        in_len = jidx < v.lengths[:, None]
        keep = in_len & pred_l.data.astype(jnp.bool_)
        if pred_l.elem_valid is not None:
            keep = keep & pred_l.elem_valid
        order = jax.lax.sort(
            (jnp.where(keep, 0, 1).astype(jnp.int32),
             jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :],
                              (cap, W))),
            num_keys=1, dimension=1, is_stable=True)[1]
        data2 = jnp.take_along_axis(val_l.data, order, axis=1)
        ln2 = jnp.sum(keep, axis=1).astype(jnp.int32)
        ev2 = jidx < ln2[:, None]
        if val_l.elem_valid is not None:
            ev2 = ev2 & jnp.take_along_axis(val_l.elem_valid, order, axis=1)
        return Val(val_l.dtype, data2, v.validity, val_l.sdict,
                   v.is_scalar, v.live, lengths=ln2, elem_valid=ev2)
    if not meta.is_elementwise(inner_e):
        raise InvalidOperationError(
            ".list.eval supports elementwise expressions and a top-level "
            "pl.element().filter(...); explode for anything else")
    cap, W = v.data.shape
    flat = v.data.reshape(cap * W)
    in_len = jnp.arange(W)[None, :] < v.lengths[:, None]
    evalid = v.elem_valid if v.elem_valid is not None else in_len
    fcol = Column(v.dtype.inner, flat,
                  (evalid & in_len).reshape(cap * W), v.sdict)
    ft = Table(["__pt_element__"], {"__pt_element__": fcol}, cap * W,
               None, in_len.reshape(cap * W))
    rv = eval_expr(inner_e, ft, "select")
    data2 = jnp.broadcast_to(rv.data, (cap * W,)).reshape(cap, W)
    ev2 = None
    if rv.validity is not None:
        ev2 = (jnp.broadcast_to(rv.validity, (cap * W,)).reshape(cap, W)
               & in_len)
    return Val(ListT(rv.dtype), data2, v.validity, rv.sdict, v.is_scalar,
               v.live, lengths=v.lengths, elem_valid=ev2)


def _eval_list_filter(e: Expr, table: Table, ctx: str) -> Val:
    """`.list.filter(pred)`: evaluate the element predicate via list_eval,
    then compact kept elements to the row front (one axis-1 sort)."""
    v = eval_expr(e.children[0], table, ctx)
    if v.lengths is None:
        raise InvalidOperationError(f".list.filter on {v.dtype!r}")
    pv = _eval_list_eval(e, v, table, ctx)
    cap, W = v.data.shape
    jidx = jnp.arange(W)[None, :]
    in_len = jidx < v.lengths[:, None]
    keep = in_len & pv.data.astype(jnp.bool_)
    if pv.elem_valid is not None:
        keep = keep & pv.elem_valid
    order = jax.lax.sort((jnp.where(keep, 0, 1).astype(jnp.int32),
                          jnp.broadcast_to(
                              jnp.arange(W, dtype=jnp.int32)[None, :],
                              (cap, W))),
                         num_keys=1, dimension=1, is_stable=True)[1]
    data2 = jnp.take_along_axis(v.data, order, axis=1)
    ln2 = jnp.sum(keep, axis=1).astype(jnp.int32)
    ev2 = jidx < ln2[:, None]
    if v.elem_valid is not None:
        ev2 = ev2 & jnp.take_along_axis(v.elem_valid, order, axis=1)
    return Val(v.dtype, data2, v.validity, v.sdict, v.is_scalar, v.live,
               lengths=ln2, elem_valid=ev2)


def _eval_list_set(e: Expr, table: Table, ctx: str) -> Val:
    """Per-row set algebra between two list columns (reference:
    polars-ops list set operations): align dictionaries, mark membership
    of each element in self/other via sorted search, filter + dedupe."""
    from ..dtypes import List as ListT
    from ..ops import nested as N
    how = e.attrs["how"]
    a = eval_expr(e.children[0], table, ctx)
    b = eval_expr(e.children[1], table, ctx)
    if a.lengths is None or b.lengths is None:
        raise InvalidOperationError("list.set_* requires two list columns")

    def clean(v2):
        # null elements are dropped before set algebra (membership tests
        # are value-based)
        if v2.elem_valid is None:
            return v2
        res2 = N.list_namespace_op("drop_nulls", v2, {})
        return Val(res2["dtype"], res2["data"], res2.get("validity"),
                   v2.sdict, v2.is_scalar, v2.live,
                   lengths=res2.get("lengths"),
                   elem_valid=None)
    a = clean(a)
    b = clean(b)
    inner_a = a.dtype.inner
    if inner_a.is_string:
        # align the two dictionaries to shared codes
        fa = Val(inner_a, a.data.reshape(-1), None, a.sdict)
        fb = Val(b.dtype.inner, b.data.reshape(-1), None, b.sdict)
        ra, rb = _align_strings(fa, fb)
        a = Val(a.dtype, ra.data.reshape(a.data.shape), a.validity,
                ra.sdict, a.is_scalar, a.live, lengths=a.lengths,
                elem_valid=a.elem_valid)
        b = Val(b.dtype, rb.data.reshape(b.data.shape), b.validity,
                ra.sdict, b.is_scalar, b.live, lengths=b.lengths,
                elem_valid=b.elem_valid)
    cap, Wa = a.data.shape
    Wb = b.data.shape[1]
    b = Val(b.dtype, b.data.astype(a.data.dtype), b.validity, b.sdict,
            b.is_scalar, b.live, lengths=b.lengths, elem_valid=b.elem_valid)
    jida = jnp.arange(Wa)[None, :]
    in_a = jida < a.lengths[:, None]
    in_b = jnp.arange(Wb)[None, :] < b.lengths[:, None]
    # sort b's rows to enable per-row membership binary search
    _, hib = _type_bounds(b.data.dtype)
    bs = jnp.sort(jnp.where(in_b, b.data, hib), axis=1)

    def member(vals):
        pos = jax.vmap(jnp.searchsorted)(bs, vals)
        posc = jnp.clip(pos, 0, Wb - 1)
        return jnp.take_along_axis(bs, posc, axis=1) == vals
    a_in_b = member(a.data)
    if how == "union":
        # self elements, then b elements not in a
        _, hia = _type_bounds(a.data.dtype)
        as_ = jnp.sort(jnp.where(in_a, a.data, hia), axis=1)
        posb = jax.vmap(jnp.searchsorted)(as_, b.data)
        b_in_a = jnp.take_along_axis(
            as_, jnp.clip(posb, 0, Wa - 1), axis=1) == b.data
        data = jnp.concatenate([a.data, b.data], axis=1)
        keep = jnp.concatenate([in_a, in_b & ~b_in_a], axis=1)
    elif how == "intersection":
        data = a.data
        keep = in_a & a_in_b
    elif how == "difference":
        data = a.data
        keep = in_a & ~a_in_b
    else:  # symmetric_difference
        _, hia = _type_bounds(a.data.dtype)
        as_ = jnp.sort(jnp.where(in_a, a.data, hia), axis=1)
        posb = jax.vmap(jnp.searchsorted)(as_, b.data)
        b_in_a = jnp.take_along_axis(
            as_, jnp.clip(posb, 0, Wa - 1), axis=1) == b.data
        data = jnp.concatenate([a.data, b.data], axis=1)
        keep = jnp.concatenate([in_a & ~a_in_b, in_b & ~b_in_a], axis=1)
    Wt = data.shape[1]
    order = jax.lax.sort((jnp.where(keep, 0, 1).astype(jnp.int32),
                          jnp.broadcast_to(
                              jnp.arange(Wt, dtype=jnp.int32)[None, :],
                              (cap, Wt))),
                         num_keys=1, dimension=1, is_stable=True)[1]
    data2 = jnp.take_along_axis(data, order, axis=1)
    ln2 = jnp.sum(keep, axis=1).astype(jnp.int32)
    pre = Val(ListT(inner_a), data2, _and_valid(a.validity, b.validity),
              a.sdict, a.is_scalar, a.live, lengths=ln2,
              elem_valid=jnp.arange(Wt)[None, :] < ln2[:, None])
    # dedupe within each row (set semantics)
    from ..ops import nested as N
    res = N.list_namespace_op("unique", pre, {})
    return Val(res["dtype"], res["data"], res.get("validity"),
               res.get("sdict") or a.sdict, a.is_scalar, a.live,
               lengths=res.get("lengths"), elem_valid=res.get("elem_valid"))


def _eval_list(e: Expr, v: Val, table: Table) -> Val:
    """`.list.<op>` — masked axis-1 kernels (`ops/nested.py`); `join` is a
    host-side dictionary transform like the `.str` ops."""
    from ..ops import nested as N

    op = e.attrs["op"]
    if op == "to_list":
        from ..dtypes import Array as ArrayT, List as ListT
        if isinstance(v.dtype, ArrayT):
            return Val(ListT(v.dtype.inner), v.data, v.validity, v.sdict,
                       v.is_scalar, v.live, lengths=v.lengths,
                       elem_valid=v.elem_valid, fields=v.fields)
        return v
    if op == "item":
        # strict single-element lists (reference: list.item,
        # py-polars/src/polars/expr/list.py:688) — one host-synced check
        if v.lengths is None:
            raise InvalidOperationError(f".list.item on {v.dtype!r}")
        allow_empty = e.attrs.get("allow_empty", False)
        live = v.live if v.live is not None else table.row_mask()
        lv = live if v.validity is None else (live & v.validity)
        ln = np.asarray(jnp.where(lv, v.lengths, 1))
        if (ln > 1).any():
            raise ComputeError(
                ".list.item: a sublist has more than one element")
        if not allow_empty and (ln < 1).any():
            raise ComputeError(
                ".list.item: empty sublist (pass allow_empty=True for "
                "null)")
        return _eval_list(Expr("list", e.children, op="get", index=0),
                          v, table)
    if op == "to_struct":
        from ..dtypes import Struct as StructT
        if v.lengths is None:
            raise InvalidOperationError(f".list.to_struct on {v.dtype!r}")
        names = e.attrs.get("fields")
        W = v.data.shape[1]
        nf = int(jnp.max(v.lengths)) if names is None else len(names)
        nf = max(nf, 1)
        names = list(names) if names is not None else \
            [f"field_{i}" for i in range(nf)]
        inner = v.dtype.inner
        jidx = jnp.arange(W)[None, :]
        m = jidx < v.lengths[:, None]
        if v.elem_valid is not None:
            m = m & v.elem_valid
        fields = {}
        for i, nm in enumerate(names):
            i2 = min(i, W - 1)
            fields[nm] = Val(inner, v.data[:, i2], m[:, i2], v.sdict)
        return Val(StructT([(nm, inner) for nm in names]), None,
                   v.validity, None, v.is_scalar, v.live, fields=fields)
    if op == "join":
        if v.lengths is None or not v.dtype.inner.is_string:
            raise InvalidOperationError(".list.join requires List(String)")
        sep = e.attrs.get("separator", "")
        data = np.asarray(v.data)
        lens = np.asarray(v.lengths)
        ev = np.asarray(v.elem_valid) if v.elem_valid is not None else None
        cap = data.shape[0]
        words = v.sdict.values if v.sdict is not None else np.array([], object)
        out = np.empty(cap, dtype=object)
        mask = np.ones(cap, dtype=bool)
        for i in range(cap):
            L = int(lens[i])
            codes = data[i, :L]
            if ev is not None and not ev[i, :L].all():
                out[i] = None  # null element -> null result (polars default)
                mask[i] = False
                continue
            out[i] = sep.join(str(words[c]) for c in codes)
        codes, sdict = StringDict.encode(out, mask)
        validity = jnp.asarray(mask) if not mask.all() else None
        validity = _and_valid(validity, v.validity)
        return Val(String, jnp.asarray(codes), validity, sdict,
                   v.is_scalar, v.live)
    res = N.list_namespace_op(op, v, e.attrs)
    return Val(res["dtype"], res.get("data"), res.get("validity"),
               res.get("sdict"), v.is_scalar, v.live,
               lengths=res.get("lengths"), elem_valid=res.get("elem_valid"),
               fields=res.get("fields"))


def _eval_shrink_dtype(v: Val, table: Table) -> Val:
    """Cast to the narrowest dtype holding the values (reference:
    `polars-ops` shrink_dtype). Host-syncs min/max once."""
    from ..dtypes import (Int8, Int16, Int32, Int64, UInt8, UInt16, UInt32,
                          UInt64, Float32)
    dt = v.dtype
    if dt.is_float:
        return cast_val(v, Float32)
    if not dt.is_integer:
        return v
    mask = table.row_mask() if v.live is None else \
        (table.row_mask() & v.live)
    if v.validity is not None:
        mask = mask & v.validity
    if v.is_scalar:
        mask = jnp.ones(v.data.shape, jnp.bool_)
    lo_b, hi_b = _type_bounds(v.data.dtype)
    mn = int(jnp.min(jnp.where(mask, v.data, hi_b)))
    mx = int(jnp.max(jnp.where(mask, v.data, lo_b)))
    if mx < mn:
        mn = mx = 0
    if dt.is_signed_integer:
        for cand, target in ((Int8, (-128, 127)),
                             (Int16, (-32768, 32767)),
                             (Int32, (-2**31, 2**31 - 1))):
            if target[0] <= mn and mx <= target[1]:
                return cast_val(v, cand)
        return cast_val(v, Int64)
    for cand, hi in ((UInt8, 255), (UInt16, 65535), (UInt32, 2**32 - 1)):
        if mx <= hi:
            return cast_val(v, cand)
    return cast_val(v, UInt64)


def _eval_hist(e: Expr, v: Val, table: Table) -> Val:
    """Histogram counts (reference: polars-ops hist). Row-count-changing:
    the result has one row per bin, exposed via a live-prefix mask."""
    if not v.dtype.is_numeric:
        raise InvalidOperationError(f"hist on {v.dtype!r}")
    mask = table.row_mask() if v.live is None else (table.row_mask() & v.live)
    if v.validity is not None:
        mask = mask & v.validity
    cap = v.data.shape[0]
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    x = v.data.astype(fdt)
    bins = e.attrs.get("bins")
    if bins is not None:
        edges = jnp.asarray(list(bins), fdt)
        nb = len(bins) - 1
    else:
        bc = int(e.attrs.get("bin_count") or 10)
        lo = jnp.min(jnp.where(mask, x, jnp.inf))
        hi = jnp.max(jnp.where(mask, x, -jnp.inf))
        span = jnp.where(hi > lo, hi - lo, 1.0)
        edges = lo + span * jnp.arange(bc + 1, dtype=fdt) / bc
        nb = bc
    if nb < 1:
        raise InvalidOperationError("hist needs at least one bin")
    # bin index: count of edges <= x, clamped; left-closed first bin
    ge = (x[:, None] >= edges[None, :-1]) & (x[:, None] <= edges[None, 1:])
    # assign to the first matching bin
    first = jnp.argmax(ge, axis=1)
    inb = jnp.any(ge, axis=1) & mask
    counts = jnp.zeros((nb,), jnp.uint32).at[
        jnp.where(inb, first, 0)].add(jnp.where(inb, 1, 0).astype(jnp.uint32))
    out_cap = cap if cap >= nb else nb
    data = jnp.concatenate([counts, jnp.zeros(out_cap - nb, jnp.uint32)])
    live = jnp.arange(out_cap) < nb
    if not e.attrs.get("include_breakpoint"):
        return Val(UInt32, data, None, None, False, live)
    from ..dtypes import Struct as StructT
    bp = jnp.concatenate([edges[1:].astype(_stor(Float64)),
                          jnp.zeros(out_cap - nb, _stor(Float64))])
    fields = {"breakpoint": Val(Float64, bp, None, None, False),
              "count": Val(UInt32, data, None, None, False)}
    return Val(StructT([("breakpoint", Float64), ("count", UInt32)]),
               None, None, None, False, live, fields=fields)


def _eval_cut(e: Expr, v: Val, table: Table) -> Val:
    """cut/qcut -> Categorical bins (reference: `polars-ops`
    series/cut.rs). Bin index = count of breaks below the value (a tiny
    static comparison fan-out, vectorized); labels go through a sorted
    dictionary LUT."""
    from ..dtypes import Categorical as _Cat
    if not v.dtype.is_numeric:
        raise InvalidOperationError(f"cut on {v.dtype!r}")
    left_closed = bool(e.attrs.get("left_closed", False))
    x = v.data
    if e.kind == "qcut":
        qs = list(e.attrs["quantiles"])
        mask = table.row_mask() if v.live is None else \
            (table.row_mask() & v.live)
        if v.validity is not None:
            mask = mask & v.validity
        xf = x.astype(jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
        lo_b, hi_b = _type_bounds(xf.dtype)
        n = jnp.sum(mask)
        packed = jnp.sort(jnp.where(mask, xf, hi_b))
        posf = jnp.asarray(qs) * (n - 1).astype(xf.dtype)
        lo_i = jnp.clip(jnp.floor(posf).astype(jnp.int32), 0,
                        x.shape[0] - 1)
        hi_i = jnp.clip(lo_i + 1, 0, jnp.maximum(n - 1, 0))  # stay in live
        lo_i = jnp.minimum(lo_i, hi_i)
        frac = posf - lo_i.astype(xf.dtype)
        bk = packed[lo_i] * (1 - frac) + packed[hi_i] * frac
        breaks = [float(b) for b in np.asarray(bk)]  # host sync
    else:
        breaks = [float(b) for b in e.attrs["breaks"]]
    labels = e.attrs.get("labels")
    if labels is None:
        def _fmt_break(b: float) -> str:
            return str(int(b)) if float(b).is_integer() else _fmt_float(b)
        edges = ["-inf"] + [_fmt_break(b) for b in breaks] + ["inf"]
        if left_closed:
            labels = [f"[{a}, {b})" for a, b in zip(edges[:-1], edges[1:])]
        else:
            labels = [f"({a}, {b}]" for a, b in zip(edges[:-1], edges[1:])]
    if len(labels) != len(breaks) + 1:
        raise ShapeError(
            f"cut needs {len(breaks) + 1} labels, got {len(labels)}")
    idx = jnp.zeros(x.shape, jnp.int32)
    for b in breaks:
        cond = (x >= b) if left_closed else (x > b)
        idx = idx + cond.astype(jnp.int32)
    codes_lut, sdict = StringDict.encode(np.asarray(labels, dtype=object))
    data = jnp.asarray(codes_lut)[idx]
    return Val(_Cat(), data, v.validity, sdict, v.is_scalar, v.live)


def _try_or_none(fn):
    try:
        return fn()
    except Exception:
        return None


def _remap_dict_val(v: Val, mapped, out_dt) -> Val:
    """Rebuild a dict-coded Val whose dictionary entries were transformed
    (possibly to None, possibly order-breaking): sort+dedupe the new
    entries, remap codes, null out None entries."""
    keep = sorted({m for m in mapped if m is not None})
    index = {m: i for i, m in enumerate(keep)}
    remap = np.full(max(len(mapped), 1), NULL_CODE, dtype=np.int32)
    for i, m in enumerate(mapped):
        if m is not None:
            remap[i] = index[m]
    rm = jnp.asarray(remap)
    code = v.data
    data = jnp.where(code >= 0, rm[jnp.clip(code, 0, len(remap) - 1)],
                     NULL_CODE)
    validity = _and_valid(v.validity, data != NULL_CODE)
    return Val(out_dt, data, validity,
               StringDict(np.array(keep, dtype=object)), v.is_scalar, v.live)


def _eval_bin(e: Expr, v: Val) -> Val:
    """Binary (`bytes`) functions: host-side dictionary transforms +
    device gathers, same design as `.str` (reference surface:
    py-polars/src/polars/expr/binary.py)."""
    op = e.attrs["op"]
    if not v.dtype.is_binary:
        raise InvalidOperationError(f".bin.{op} on {v.dtype!r}")
    sd = v.sdict or EMPTY_SDICT
    code = v.data
    words = [bytes(w) for w in sd.values]

    def lut_gather(lut, out_dt):
        lt = jnp.asarray(lut if len(lut) else np.zeros(1, lut.dtype))
        data = lt[jnp.clip(code, 0, max(len(lut) - 1, 0))]
        return Val(out_dt, data, v.validity, None, v.is_scalar, v.live)

    if op in ("contains", "starts_with", "ends_with"):
        pat = e.attrs["pat"]
        pat = pat.encode("utf-8") if isinstance(pat, str) else bytes(pat)
        fn = {"contains": lambda w: pat in w,
              "starts_with": lambda w: w.startswith(pat),
              "ends_with": lambda w: w.endswith(pat)}[op]
        return lut_gather(np.array([fn(w) for w in words], dtype=bool),
                          Boolean)
    if op == "size":
        lut = np.array([len(w) for w in words], dtype=np.uint32)
        unit = e.attrs.get("unit", "b")
        if unit != "b":
            scale = {"kb": 1024, "mb": 1024**2, "gb": 1024**3,
                     "tb": 1024**4}[unit]
            return lut_gather((lut / scale).astype(np.float64), Float64)
        return lut_gather(lut, UInt32)
    if op == "slice":
        from ..dtypes import Binary
        off = e.attrs["offset"]
        ln = e.attrs.get("length")

        def cut(w):
            start = off if off >= 0 else max(len(w) + off, 0)
            end = len(w) if ln is None else start + ln
            return w[start:end]

        return _remap_dict_val(v, [cut(w) for w in words], Binary)
    if op == "encode":
        import base64
        if e.attrs["encoding"] == "hex":
            mapped = [w.hex() for w in words]
        else:
            mapped = [base64.b64encode(w).decode("ascii") for w in words]
        return _remap_dict_val(v, mapped, String)
    if op == "decode":
        import base64
        strict = e.attrs.get("strict", True)
        enc = e.attrs["encoding"]
        mapped = []
        for w in words:
            try:
                if enc == "hex":
                    mapped.append(bytes.fromhex(w.decode("ascii")))
                else:
                    mapped.append(base64.b64decode(w, validate=True))
            except Exception:
                if strict:
                    raise InvalidOperationError(
                        f".bin.decode({enc!r}): invalid input {w!r}")
                mapped.append(None)
        from ..dtypes import Binary
        return _remap_dict_val(v, mapped, Binary())
    if op == "reinterpret":
        from ..dtypes import physical_numpy_dtype
        out_dt = e.attrs["dtype"]
        if isinstance(out_dt, type) and issubclass(out_dt, DataType):
            out_dt = out_dt()
        endian = e.attrs.get("endianness", "little")
        npdt = np.dtype(physical_numpy_dtype(out_dt)).newbyteorder(
            "<" if endian == "little" else ">")
        vals = np.zeros(max(len(words), 1), dtype=npdt)
        ok = np.zeros(max(len(words), 1), dtype=bool)
        for i, w in enumerate(words):
            if len(w) == npdt.itemsize:
                vals[i] = np.frombuffer(w, dtype=npdt)[0]
                ok[i] = True
            else:
                raise InvalidOperationError(
                    f".bin.reinterpret: value has {len(w)} bytes, "
                    f"{out_dt!r} needs {npdt.itemsize}")
        lt = jnp.asarray(vals.astype(storage_numpy_dtype(out_dt)))
        okj = jnp.asarray(ok)
        cc = jnp.clip(code, 0, max(len(words) - 1, 0))
        data = lt[cc]
        validity = _and_valid(v.validity, okj[cc])
        return Val(out_dt, data, validity, None, v.is_scalar, v.live)
    raise InvalidOperationError(f"unknown .bin op {op!r}")


def _eval_str(e: Expr, v: Val, table: Table) -> Val:
    import re as _re
    from ..dtypes import Categorical as _Cat
    op = e.attrs["op"]
    if v.dtype.is_binary or \
            not (v.dtype.is_string or isinstance(v.dtype, _Cat)):
        raise InvalidOperationError(
            f".str.{op} on {v.dtype!r}"
            + (" (use .bin)" if v.dtype.is_binary else ""))
    sd = v.sdict or EMPTY_SDICT
    code = v.data

    def lut_gather(lut: np.ndarray, out_dt, sdict=None):
        if len(lut) == 0:
            data = jnp.zeros(code.shape, dtype=lut.dtype)
        else:
            lt = jnp.asarray(lut)
            data = lt[jnp.clip(code, 0, len(lut) - 1)]
        return Val(out_dt, data, v.validity, sdict, v.is_scalar, v.live)

    def opt_strings(fn):
        """str -> Optional[str] per dictionary entry; None -> null rows."""
        mapped = [fn(s) for s in sd.values]
        keep = [m for m in mapped if m is not None]
        uniq, inv = np.unique(np.asarray(keep, dtype=object).astype(str),
                              return_inverse=True) if keep else \
            (np.array([], dtype=object), np.array([], dtype=np.int64))
        remap = np.full(max(len(mapped), 1), NULL_CODE, dtype=np.int32)
        j = 0
        for i, m in enumerate(mapped):
            if m is not None:
                remap[i] = inv[j]
                j += 1
        rm = jnp.asarray(remap)
        data = jnp.where(code >= 0, rm[jnp.clip(code, 0, len(remap) - 1)],
                         NULL_CODE)
        validity = _and_valid(v.validity, data != NULL_CODE)
        return Val(String, data, validity, StringDict(uniq), v.is_scalar,
                   v.live)

    def list_of_strings(parts_fn):
        """str -> list[str] per dictionary entry -> List(String) column."""
        from ..dtypes import List as ListT
        from ..batch import width_for
        words = sd.values
        parts = [parts_fn(str(w)) for w in words]
        W = width_for(max((len(p) for p in parts), default=1))
        flat = [s for p in parts for s in p]
        codes_flat, nd = StringDict.encode(
            np.array(flat, dtype=object) if flat
            else np.array([], dtype=object))
        lut = np.zeros((max(len(words), 1), W), dtype=np.int32)
        lut_len = np.zeros(max(len(words), 1), dtype=np.int32)
        pos = 0
        for i, p in enumerate(parts):
            lut[i, :len(p)] = codes_flat[pos:pos + len(p)]
            lut_len[i] = len(p)
            pos += len(p)
        cidx = jnp.clip(code, 0, lut.shape[0] - 1)
        data2 = jnp.asarray(lut)[cidx]
        lens = jnp.asarray(lut_len)[cidx]
        return Val(ListT(String), data2, v.validity, nd, v.is_scalar,
                   v.live, lengths=lens)

    def struct_of_strings(fields_fn, names):
        """str -> tuple[Optional[str], ...] -> Struct of String fields."""
        from ..dtypes import Struct as StructT
        fields = {}
        for gi, nm in enumerate(names):
            fields[nm] = opt_strings(lambda s, gi=gi: fields_fn(s)[gi])
        return Val(StructT([(nm, String) for nm in names]), None,
                   v.validity, None, v.is_scalar, v.live, fields=fields)

    if op == "len_chars":
        return lut_gather(sd.map_to_array(len, np.uint32), UInt32)
    if op == "len_bytes":
        return lut_gather(sd.map_to_array(lambda s: len(s.encode()), np.uint32), UInt32)
    if op in ("to_uppercase", "to_lowercase", "to_titlecase", "strip_chars",
              "strip_chars_start", "strip_chars_end", "slice", "replace",
              "zfill", "pad_start", "pad_end", "reverse"):
        fn = _str_transform(op, e.attrs)
        nd, remap = sd.map_to_strings(fn)
        if len(remap) == 0:
            return Val(String, code, v.validity, nd, v.is_scalar, v.live)
        rm = jnp.asarray(remap)
        data = jnp.where(code >= 0, rm[jnp.clip(code, 0, len(remap) - 1)], NULL_CODE)
        return Val(String, data, v.validity, nd, v.is_scalar, v.live)
    if op in ("starts_with", "ends_with", "contains", "count_matches"):
        pat = e.attrs["pat"]
        literal = e.attrs.get("literal", False)
        if op == "starts_with":
            f = lambda s: s.startswith(pat)
        elif op == "ends_with":
            f = lambda s: s.endswith(pat)
        elif op == "contains":
            if literal:
                f = lambda s: pat in s
            else:
                rx = _re.compile(pat)
                f = lambda s: rx.search(s) is not None
        else:
            if literal:
                f = lambda s: s.count(pat)
            else:
                rx = _re.compile(pat)
                f = lambda s: len(rx.findall(s))
        out_dt = UInt32 if op == "count_matches" else Boolean
        return lut_gather(sd.map_to_array(f, np.uint32 if op == "count_matches"
                                          else np.bool_), out_dt)
    if op == "split":
        from ..dtypes import List as ListT
        from ..batch import width_for
        by = e.attrs["by"]
        words = sd.values
        parts = [str(w).split(by) for w in words]
        W = width_for(max((len(p) for p in parts), default=1))
        flat = [s for p in parts for s in p]
        codes_flat, nd = StringDict.encode(
            np.array(flat, dtype=object) if flat
            else np.array([], dtype=object))
        lut = np.zeros((max(len(words), 1), W), dtype=np.int32)
        lut_len = np.zeros(max(len(words), 1), dtype=np.int32)
        pos = 0
        for i, p in enumerate(parts):
            lut[i, :len(p)] = codes_flat[pos:pos + len(p)]
            lut_len[i] = len(p)
            pos += len(p)
        cidx = jnp.clip(code, 0, lut.shape[0] - 1)
        data2 = jnp.asarray(lut)[cidx]
        lens = jnp.asarray(lut_len)[cidx]
        return Val(ListT(String), data2, v.validity, nd, v.is_scalar,
                   v.live, lengths=lens)
    if op in ("strip_prefix", "strip_suffix", "normalize", "escape_regex",
              "replace_many", "encode"):
        if op == "strip_prefix":
            pat = e.attrs["pat"]
            fn = lambda s: s[len(pat):] if s.startswith(pat) else s
        elif op == "strip_suffix":
            pat = e.attrs["pat"]
            fn = lambda s: s[:-len(pat)] if pat and s.endswith(pat) else s
        elif op == "normalize":
            import unicodedata
            form = e.attrs.get("form", "NFC")
            fn = lambda s: unicodedata.normalize(form, s)
        elif op == "escape_regex":
            fn = _re.escape
        elif op == "replace_many":
            pats = e.attrs["patterns"]
            vals = e.attrs["values"]

            def fn(s):
                for p2, v2 in zip(pats, vals):
                    s = s.replace(p2, v2)
                return s
        else:  # encode
            enc = e.attrs["encoding"]
            if enc == "hex":
                fn = lambda s: s.encode().hex()
            elif enc == "base64":
                import base64
                fn = lambda s: base64.b64encode(s.encode()).decode()
            else:
                raise InvalidOperationError(f"unknown encoding {enc!r}")
        nd, remap = sd.map_to_strings(fn)
        rm = jnp.asarray(remap) if len(remap) else jnp.zeros(1, jnp.int32)
        data = jnp.where(code >= 0,
                         rm[jnp.clip(code, 0, max(len(remap) - 1, 0))],
                         NULL_CODE)
        return Val(String, data, v.validity, nd, v.is_scalar, v.live)
    if op == "decode":
        enc = e.attrs["encoding"]
        if enc == "hex":
            fn = lambda s: _try_or_none(lambda: bytes.fromhex(s).decode())
        elif enc == "base64":
            import base64
            fn = lambda s: _try_or_none(
                lambda: base64.b64decode(s).decode())
        else:
            raise InvalidOperationError(f"unknown encoding {enc!r}")
        return opt_strings(fn)
    if op == "json_path_match":
        import json as _json
        path = e.attrs["path"]
        parts = [p for p in path.lstrip("$").lstrip(".").split(".") if p]

        def fn(s):
            try:
                obj = _json.loads(s)
            except ValueError:
                return None
            for p2 in parts:
                nm, idxs = p2, []
                while nm.endswith("]"):
                    nm, _, tail = nm.rpartition("[")
                    idxs.insert(0, int(tail[:-1]))
                if nm:
                    if not isinstance(obj, dict) or nm not in obj:
                        return None
                    obj = obj[nm]
                for ix in idxs:
                    if not isinstance(obj, list) or ix >= len(obj):
                        return None
                    obj = obj[ix]
            if obj is None or isinstance(obj, (dict, list)):
                return None if obj is None else _json.dumps(obj)
            return obj if isinstance(obj, str) else _json.dumps(obj)
        return opt_strings(fn)
    if op == "contains_any":
        pats = e.attrs["patterns"]
        if e.attrs.get("nocase"):
            lp = [p.lower() for p in pats]
            f = lambda s: any(p in s.lower() for p in lp)
        else:
            f = lambda s: any(p in s for p in pats)
        return lut_gather(sd.map_to_array(f, np.bool_), Boolean)
    if op == "find":
        pat = e.attrs["pat"]
        if e.attrs.get("literal"):
            f = lambda s: s.find(pat)
        else:
            rx = _re.compile(pat)
            f = lambda s: (lambda m: -1 if m is None else m.start())(
                rx.search(s))
        lut = sd.map_to_array(f, np.int64)
        out = lut_gather(np.maximum(lut, 0).astype(np.uint32), UInt32)
        found = lut_gather(1 * (lut >= 0), UInt32)
        validity = _and_valid(out.validity, found.data > 0)
        return Val(UInt32, out.data, validity, None, v.is_scalar, v.live)
    if op == "find_many":
        from ..dtypes import List as ListT
        pats = e.attrs["patterns"]

        def findall(s):
            hits = []
            for p2 in pats:
                st = 0
                while True:
                    i2 = s.find(p2, st)
                    if i2 < 0:
                        break
                    hits.append(i2)
                    st = i2 + 1
            return [str(h) for h in sorted(hits)]
        lv = list_of_strings(findall)
        # numeric indices, not strings: re-map the inner dict to ints
        inner_sd = lv.sdict or EMPTY_SDICT
        as_int = np.asarray([int(s2) if s2 != "" else 0
                             for s2 in inner_sd.values], dtype=np.uint32) \
            if len(inner_sd.values) else np.zeros(1, np.uint32)
        data = jnp.asarray(as_int)[jnp.clip(lv.data, 0, len(as_int) - 1)]
        return Val(ListT(UInt32), data, lv.validity, None, v.is_scalar,
                   v.live, lengths=lv.lengths)
    if op == "extract_all":
        rx = _re.compile(e.attrs["pat"])
        return list_of_strings(lambda s: [m if isinstance(m, str) else m[0]
                                          for m in rx.findall(s)])
    if op == "extract_many":
        pats = e.attrs["patterns"]

        def matches(s):
            hits = []
            for p2 in pats:
                st = 0
                while True:
                    i2 = s.find(p2, st)
                    if i2 < 0:
                        break
                    hits.append((i2, p2))
                    st = i2 + 1
            return [p2 for _, p2 in sorted(hits)]
        return list_of_strings(matches)
    if op == "chars":
        return list_of_strings(list)
    if op == "extract_groups":
        rx = _re.compile(e.attrs["pat"])
        ng = rx.groups
        names = []
        by_idx = {i2: nm for nm, i2 in rx.groupindex.items()}
        for gi in range(1, ng + 1):
            names.append(by_idx.get(gi, str(gi)))

        def groups_of(s):
            m = rx.search(s)
            if m is None:
                return (None,) * ng
            return m.groups()
        return struct_of_strings(groups_of, names)
    if op == "split_exact":
        by = e.attrs["by"]
        n2 = int(e.attrs["n"])

        def fields_of(s):
            p2 = s.split(by)
            return tuple(p2[i2] if i2 < len(p2) else None
                         for i2 in range(n2 + 1))
        return struct_of_strings(fields_of,
                                 [f"field_{i2}" for i2 in range(n2 + 1)])
    if op == "splitn":
        by = e.attrs["by"]
        n2 = int(e.attrs["n"])

        def fields_of(s):
            p2 = s.split(by, n2 - 1)
            return tuple(p2[i2] if i2 < len(p2) else None
                         for i2 in range(n2))
        return struct_of_strings(fields_of,
                                 [f"field_{i2}" for i2 in range(n2)])
    if op == "str_concat":
        delim = e.attrs.get("delimiter", "")
        ignore_nulls = e.attrs.get("ignore_nulls", True)
        mask = np.asarray(table.row_mask() if v.live is None
                          else (table.row_mask() & v.live))
        codes = np.asarray(code)
        valid = np.asarray(v.valid_or_true())
        dec = sd.decode(codes.astype(np.int32))
        vals = [dec[i2] if valid[i2] else None
                for i2 in range(len(dec)) if mask[i2]]
        if not ignore_nulls and any(x2 is None for x2 in vals):
            return _scalar(String, jnp.asarray(NULL_CODE, jnp.int32),
                           jnp.zeros((), jnp.bool_), EMPTY_SDICT)
        joined = delim.join([x2 for x2 in vals if x2 is not None])
        codes2, nd = StringDict.encode(np.array([joined], dtype=object))
        return _scalar(String, jnp.asarray(codes2[0], jnp.int32), None, nd)
    if op == "to_time":
        from ..dtypes import Time as _Time
        import datetime as _dtm
        fmt = e.attrs.get("format")

        def parse(s):
            try:
                t2 = _dtm.datetime.strptime(s, fmt).time() if fmt \
                    else _dtm.time.fromisoformat(s)
            except ValueError:
                return -1
            return ((t2.hour * 3600 + t2.minute * 60 + t2.second)
                    * 1_000_000_000 + t2.microsecond * 1000)
        lut = sd.map_to_array(parse, np.int64)
        out = lut_gather(lut, _Time)
        validity = _and_valid(out.validity, out.data >= 0)
        return Val(_Time, out.data, validity, None, v.is_scalar, v.live)
    if op == "json_decode":
        # host-side parse into list/struct columns (reference:
        # polars-json str.json_decode)
        import json as _json
        from ..batch import Column as _C
        cap = code.shape[0]
        obj = sd.decode(np.asarray(code))
        parsed = []
        for s in obj:
            if s is None or s == "":
                parsed.append(None)
                continue
            try:
                parsed.append(_json.loads(s))
            except ValueError:
                parsed.append(None)
        col = _C.from_numpy(parsed, capacity=cap)
        validity = _and_valid(col.validity, v.validity)
        fields = None
        if col.fields is not None:
            fields = {fn: Val(f.dtype, f.data, f.validity, f.sdict, False,
                              lengths=f.lengths, elem_valid=f.elem_valid)
                      for fn, f in col.fields.items()}
        return Val(col.dtype, col.data, validity, col.sdict, v.is_scalar,
                   v.live, lengths=col.lengths, elem_valid=col.elem_valid,
                   fields=fields)
    if op == "extract":
        rx = _re.compile(e.attrs["pat"])
        gi = e.attrs.get("group_index", 1)

        def f(s):
            m = rx.search(s)
            return m.group(gi) if m else ""
        nd, remap = sd.map_to_strings(f)
        rm = jnp.asarray(remap) if len(remap) else jnp.zeros(1, jnp.int32)
        data = jnp.where(code >= 0, rm[jnp.clip(code, 0, max(len(remap) - 1, 0))],
                         NULL_CODE)
        # nulls where no match
        matched = sd.map_to_array(lambda s: rx.search(s) is not None, np.bool_)
        mt = jnp.asarray(matched) if len(matched) else jnp.zeros(1, jnp.bool_)
        mvalid = jnp.where(code >= 0, mt[jnp.clip(code, 0, max(len(matched) - 1, 0))],
                           False)
        return Val(String, data, _and_valid(v.validity, mvalid), nd,
                   v.is_scalar, v.live)
    if op == "to_integer":
        base = e.attrs.get("base", 10)

        def f(s):
            try:
                return int(s, base)
            except ValueError:
                return 0

        def ok(s):
            try:
                int(s, base)
                return True
            except ValueError:
                return False
        lv = lut_gather(sd.map_to_array(f, np.int64), Int64)
        okv = lut_gather(sd.map_to_array(ok, np.bool_), Boolean)
        return Val(Int64, lv.data, _and_valid(lv.validity, okv.data), None,
                   v.is_scalar, v.live)
    if op == "to_decimal":
        def f(s):
            try:
                return float(s)
            except ValueError:
                return np.nan
        return lut_gather(sd.map_to_array(f, np.float64), Float64)
    if op in ("to_datetime", "to_date", "strptime"):
        fmt = e.attrs.get("format")
        import datetime as _pydt
        if op == "to_date" or (op == "strptime" and e.attrs.get("dtype") == Date):
            def f(s):
                d = _pydt.datetime.strptime(s, fmt or "%Y-%m-%d").date()
                return (d - _pydt.date(1970, 1, 1)).days
            return lut_gather(sd.map_to_array(f, np.int32), Date)
        tu = e.attrs.get("time_unit", "us")
        scale = T.UNIT_PER_SECOND[tu]

        def f(s):
            d = _pydt.datetime.strptime(s, fmt or "%Y-%m-%dT%H:%M:%S")
            return int(d.replace(tzinfo=_pydt.timezone.utc).timestamp() * scale)
        return lut_gather(sd.map_to_array(f, np.int64), Datetime(tu))
    raise ComputeError(f"unknown str op {op!r}")


def _dollar_refs_to_backrefs(val: str) -> str:
    """Translate polars/rust-regex replacement syntax ($1, ${name}, $$)
    into Python re backrefs (\\1, \\g<name>, $)."""
    import re as _re

    def sub(m):
        tok = m.group(0)
        if tok == "$$":
            return "$"
        inner = m.group(1) or m.group(2)
        return f"\\g<{inner}>"

    return _re.sub(r"\$\$|\$\{(\w+)\}|\$(\w+)", sub, val)


def _str_transform(op, attrs):
    import re as _re
    if op == "to_uppercase":
        return str.upper
    if op == "to_lowercase":
        return str.lower
    if op == "to_titlecase":
        return str.title
    if op == "strip_chars":
        c = attrs.get("characters")
        return lambda s: s.strip(c)
    if op == "strip_chars_start":
        c = attrs.get("characters")
        return lambda s: s.lstrip(c)
    if op == "strip_chars_end":
        c = attrs.get("characters")
        return lambda s: s.rstrip(c)
    if op == "slice":
        off, ln = attrs.get("offset", 0), attrs.get("length")
        if ln is None:
            return lambda s: s[off:]
        return lambda s: s[off:off + ln] if off >= 0 else s[off:][:ln]
    if op == "replace":
        pat, val = attrs["pat"], attrs["value"]
        n = attrs.get("n", 1)
        if attrs.get("literal"):
            return lambda s: s.replace(pat, val, -1 if n < 0 else n)
        rx = _re.compile(pat)
        rep = _dollar_refs_to_backrefs(val)
        return lambda s: rx.sub(rep, s, 0 if n < 0 else n)
    if op == "zfill":
        ln = attrs["length"]
        return lambda s: s.zfill(ln)
    if op == "pad_start":
        ln, fc = attrs["length"], attrs.get("fill_char", " ")
        return lambda s: s.rjust(ln, fc)
    if op == "pad_end":
        ln, fc = attrs["length"], attrs.get("fill_char", " ")
        return lambda s: s.ljust(ln, fc)
    if op == "reverse":
        return lambda s: s[::-1]
    raise ComputeError(op)


def _eval_dt(e: Expr, v: Val, table: Table) -> Val:
    op = e.attrs["op"]
    dt = v.dtype
    x = v.data

    def out(data, out_dt):
        return Val(out_dt, data, v.validity, None, v.is_scalar, v.live)

    if isinstance(dt, Duration):
        tu = dt.time_unit
        per_s = T.UNIT_PER_SECOND[tu]
        scales = {"total_days": per_s * 86_400, "total_hours": per_s * 3_600,
                  "total_minutes": per_s * 60, "total_seconds": per_s,
                  "total_milliseconds": per_s // 1_000 or 1,
                  "total_microseconds": per_s // 1_000_000 or 1}
        if op in scales:
            if op == "total_milliseconds" and tu == "ms":
                return out(x.astype(jnp.int64), Int64)
            if op == "total_microseconds" and tu == "us":
                return out(x.astype(jnp.int64), Int64)
            return out(jnp.floor_divide(x.astype(jnp.int64), scales[op]), Int64)
        if op == "cast_time_unit":
            return cast_val(v, Duration(e.attrs["time_unit"]))
        if op == "total_nanoseconds":
            return out((x.astype(jnp.int64)
                        * (1_000_000_000 // per_s)), Int64)
        if op == "with_time_unit":
            return out(x, Duration(e.attrs["time_unit"]))
        raise InvalidOperationError(f".dt.{op} on Duration")

    if dt == Date:
        days = x.astype(jnp.int32)
        frac = None
        tu = None
    elif isinstance(dt, Datetime):
        tu = dt.time_unit
        days = T.epoch_to_days(x, tu)
        frac = T.time_of_day(x, tu)
    else:
        raise InvalidOperationError(f".dt.{op} on {dt!r}")

    # tz-aware columns: components/civil math run on LOCAL wall time
    # (epochs stay UTC in storage; reference: polars-time DST handling)
    _UTC_OPS = ("epoch", "timestamp", "cast_time_unit", "with_time_unit",
                "replace_time_zone", "convert_time_zone", "base_utc_offset",
                "dst_offset")
    tzname = dt.time_zone if isinstance(dt, Datetime) else None
    tz_active = bool(tzname) and tzname != "UTC" and op not in _UTC_OPS
    if tz_active:
        from ..ops import tzdata as TZ
        x = TZ.localize(x, tu, tzname)
        days = T.epoch_to_days(x, tu)
        frac = T.time_of_day(x, tu)

        def out(data, out_dt):  # noqa: F811 — tz-aware override
            if isinstance(out_dt, Datetime) and out_dt.time_zone:
                data = TZ.delocalize(data, out_dt.time_unit,
                                     out_dt.time_zone)
            return Val(out_dt, data, v.validity, None, v.is_scalar, v.live)

    if op in ("year", "quarter", "month", "day"):
        y, m, d = T.days_to_civil(days)
        if op == "year":
            return out(y, Int32)
        if op == "quarter":
            return out(jnp.floor_divide(m - 1, 3) + 1, Int32)
        if op == "month":
            return out(m, Int32)
        return out(d, Int32)
    if op in ("is_leap_year", "iso_year", "month_start", "month_end"):
        y, m, d = T.days_to_civil(days)
        if op == "is_leap_year":
            leap = ((jnp.remainder(y, 4) == 0) &
                    ((jnp.remainder(y, 100) != 0) |
                     (jnp.remainder(y, 400) == 0)))
            return out(leap, Boolean)
        if op == "iso_year":
            # year that owns the ISO week (week 1 can pull Dec/Jan across)
            doy = days - T.civil_to_days(y, jnp.ones_like(y),
                                         jnp.ones_like(y)) + 1
            wd = T.weekday(days)
            raw = jnp.floor_divide(doy - wd + 10, 7)
            iso_y = jnp.where(raw < 1, y - 1,
                              jnp.where(raw > 52, jnp.where(
                                  T.iso_week(days) == 1, y + 1, y), y))
            return out(iso_y.astype(jnp.int32), Int32)
        ones = jnp.ones_like(m)
        first = T.civil_to_days(y, m, ones)
        if op == "month_start":
            new_days = first
        else:
            ny = jnp.where(m == 12, y + 1, y)
            nm = jnp.where(m == 12, 1, m + 1)
            new_days = T.civil_to_days(ny, nm, ones) - 1
        if dt == Date:
            return out(new_days.astype(jnp.int32), Date)
        per_day = T.UNIT_PER_SECOND[tu] * 86_400
        return out(new_days.astype(x.dtype) * per_day +
                   (frac if frac is not None else 0), dt)
    if op in ("century", "millennium"):
        y, _, _ = T.days_to_civil(days)
        span = 100 if op == "century" else 1000
        c = jnp.floor_divide(y - 1, span) + 1
        return out(c.astype(jnp.int32), Int32)
    if op == "days_in_month":
        y, m, _ = T.days_to_civil(days)
        ones = jnp.ones_like(m)
        ny = jnp.where(m == 12, y + 1, y)
        nm = jnp.where(m == 12, 1, m + 1)
        n_days = T.civil_to_days(ny, nm, ones) - T.civil_to_days(y, m, ones)
        return out(n_days.astype(jnp.int32), Int32)
    if op == "time":
        from ..dtypes import Time as _Time
        if frac is None:
            return out(jnp.zeros_like(days, dtype=jnp.int64), _Time)
        per_s = T.UNIT_PER_SECOND[tu]
        return out(frac.astype(jnp.int64) * (1_000_000_000 // per_s), _Time)
    if op == "with_time_unit":
        return out(x, Datetime(e.attrs["time_unit"]))
    if op == "datetime":
        if dt == Date:
            return cast_val(v, Datetime("us"))
        return v
    if op in ("base_utc_offset", "dst_offset"):
        if not tzname or tzname == "UTC":
            return out(jnp.zeros_like(x, dtype=jnp.int64), Duration("ms"))
        from ..ops import tzdata as TZ
        trans, offs, dsts = TZ.offset_table(tzname)
        per_s = T.UNIT_PER_SECOND[tu]
        sec = jnp.floor_divide(x.astype(jnp.int64), per_s)
        val = TZ._lookup(sec, trans,
                         dsts if op == "dst_offset" else offs - dsts)
        return out(val.astype(jnp.int64) * 1000, Duration("ms"))
    if op == "is_business_day":
        wd = T.weekday(days)  # ISO: 1=Mon .. 7=Sun
        return out(wd <= 5, Boolean)
    if op == "add_business_days":
        n2 = int(e.attrs["n"])
        wd0 = T.weekday(days) - 1  # 0=Mon
        if n2 >= 0:
            full, rem = divmod(n2, 5)
            pos = wd0 + rem
            shift = full * 7 + rem + jnp.where(pos > 4, 2, 0)
        else:
            full, rem = divmod(-n2, 5)
            pos = wd0 - rem
            shift = -(full * 7 + rem + jnp.where(pos < 0, 2, 0))
        new_days = days + shift
        if dt == Date:
            return out(new_days.astype(jnp.int32), Date)
        per_day = T.UNIT_PER_SECOND[tu] * 86_400
        return out(new_days.astype(x.dtype) * per_day +
                   (frac if frac is not None else 0), dt)
    if op == "replace":
        y, m, d = T.days_to_civil(days)
        if e.attrs.get("year") is not None:
            y = jnp.full_like(y, int(e.attrs["year"]))
        if e.attrs.get("month") is not None:
            m = jnp.full_like(m, int(e.attrs["month"]))
        if e.attrs.get("day") is not None:
            d = jnp.full_like(d, int(e.attrs["day"]))
        new_days = T.civil_to_days(y, m, d)
        if dt == Date:
            return out(new_days.astype(jnp.int32), Date)
        per_s = T.UNIT_PER_SECOND[tu]
        per_day = per_s * 86_400
        f2 = frac if frac is not None else jnp.zeros_like(x)
        sec = jnp.floor_divide(f2, per_s)
        sub = f2 - sec * per_s
        h = jnp.floor_divide(sec, 3600)
        mi = jnp.floor_divide(sec - h * 3600, 60)
        s2 = sec - h * 3600 - mi * 60
        if e.attrs.get("hour") is not None:
            h = jnp.full_like(h, int(e.attrs["hour"]))
        if e.attrs.get("minute") is not None:
            mi = jnp.full_like(mi, int(e.attrs["minute"]))
        if e.attrs.get("second") is not None:
            s2 = jnp.full_like(s2, int(e.attrs["second"]))
        if e.attrs.get("microsecond") is not None:
            sub = jnp.full_like(
                sub, int(e.attrs["microsecond"]) * (per_s // 1_000_000))
        f3 = (h * 3600 + mi * 60 + s2) * per_s + sub
        return out(new_days.astype(x.dtype) * per_day + f3, dt)
    if op == "combine":
        tu2 = e.attrs.get("time_unit", "us")
        per_s = T.UNIT_PER_SECOND[tu2]
        per_day = per_s * 86_400
        tv = e.attrs["__time_val"]
        tns = jnp.broadcast_to(tv.data.astype(jnp.int64), days.shape)
        tfrac = jnp.floor_divide(tns, 1_000_000_000 // per_s) \
            if per_s <= 1_000_000_000 else tns * (per_s // 1_000_000_000)
        data = days.astype(jnp.int64) * per_day + tfrac
        validity = _and_valid(v.validity, tv.validity)
        return Val(Datetime(tu2), data, validity, None, v.is_scalar, v.live)
    if op in ("strftime", "to_string"):
        fmt = e.attrs.get("format") or "%Y-%m-%d %H:%M:%S"
        import datetime as _pydt
        vals = np.asarray(x)
        if dt == Date:
            objs = vals.astype("datetime64[D]").astype(_pydt.date)
        else:
            objs = vals.astype(f"datetime64[{tu}]").astype(_pydt.datetime)
        txt = np.array([o.strftime(fmt) if o is not None else ""
                        for o in objs], dtype=object)
        mask = np.asarray(v.valid_or_true())
        codes, sdict = StringDict.encode(txt, mask)
        return Val(String, jnp.asarray(codes), v.validity, sdict,
                   v.is_scalar, v.live)
    if op == "ordinal_day":
        return out(T.ordinal_day(days), Int32)
    if op == "weekday":
        return out(T.weekday(days), Int32)
    if op == "week":
        return out(T.iso_week(days), Int32)
    if op in ("hour", "minute", "second", "millisecond", "microsecond",
              "nanosecond"):
        if frac is None:
            return out(jnp.zeros_like(days), Int32)
        per_s = T.UNIT_PER_SECOND[tu]
        sec = jnp.floor_divide(frac, per_s)
        sub = frac - sec * per_s
        if op == "hour":
            return out(jnp.floor_divide(sec, 3600).astype(jnp.int32), Int32)
        if op == "minute":
            return out(jnp.remainder(jnp.floor_divide(sec, 60), 60).astype(jnp.int32), Int32)
        if op == "second":
            return out(jnp.remainder(sec, 60).astype(jnp.int32), Int32)
        scale = {"millisecond": 1_000, "microsecond": 1_000_000,
                 "nanosecond": 1_000_000_000}[op]
        if scale >= per_s:
            return out((sub * (scale // per_s)).astype(jnp.int32), Int32)
        return out(jnp.floor_divide(sub, per_s // scale).astype(jnp.int32), Int32)
    if op == "date":
        return out(days, Date)
    if op == "timestamp":
        tgt = e.attrs.get("time_unit", "us")
        if tgt in ("s", "d"):  # epoch() accepts seconds/days too
            base = x.astype(jnp.int64) if dt != Date else \
                days.astype(jnp.int64) * T.UNIT_PER_SECOND[tu or "us"] * 86_400
            per = T.UNIT_PER_SECOND[tu or "us"] * (86_400 if tgt == "d" else 1)
            return out(jnp.floor_divide(base, per), Int64)
        if dt == Date:
            return out(days.astype(jnp.int64) * T.UNIT_PER_SECOND[tgt] * 86_400, Int64)
        return out(_rescale_time(x, tu, tgt).astype(jnp.int64), Int64)
    if op == "truncate":
        if dt == Date:
            return out(T.truncate_days(days, e.attrs["every"]), Date)
        return out(T.truncate_epoch(x, tu, e.attrs["every"]), dt)
    if op == "cast_time_unit":
        return cast_val(v, Datetime(e.attrs["time_unit"]))
    if op == "replace_time_zone":
        # wall time is preserved; the stored UTC epoch shifts
        if not isinstance(dt, Datetime):
            return out(x, dt)
        from ..ops import tzdata as TZ
        newtz = e.attrs["tz"]
        wall = TZ.localize(x, tu, tzname) if tzname and tzname != "UTC" \
            else x
        if newtz is None:
            return Val(Datetime(tu), wall, v.validity, None, v.is_scalar,
                       v.live)
        epoch = wall if newtz == "UTC" else TZ.delocalize(wall, tu, newtz)
        return Val(Datetime(tu, newtz), epoch, v.validity, None,
                   v.is_scalar, v.live)
    if op == "convert_time_zone":
        if not isinstance(dt, Datetime) or not tzname:
            raise InvalidOperationError(
                "convert_time_zone on a time-zone-naive datetime; call "
                "replace_time_zone first")
        return Val(Datetime(tu, e.attrs["tz"]), x, v.validity, None,
                   v.is_scalar, v.live)
    raise ComputeError(f"unknown dt op {op!r}")


# ---------------------------------------------------------------------------
# main dispatcher
# ---------------------------------------------------------------------------

def eval_expr(e: Expr, table: Table, ctx: str = "select") -> Val:
    k = e.kind

    if k == "cse_cached":
        if not _CSE_STACK:
            return eval_expr(e.children[0], table, ctx)
        cache = _CSE_STACK[-1]
        fp = e.attrs["fp"]
        hit = cache.get(fp)
        if hit is None:
            hit = eval_expr(e.children[0], table, ctx)
            cache[fp] = hit
        return hit
    if k == "col":
        return column_to_val(table.column(e.attrs["name"]))
    if k == "lit":
        return _lit_val(e.attrs["value"], e.attrs["dtype"])
    if k in ("alias", "name_map", "name_keep", "exclude"):
        return eval_expr(e.children[0], table, ctx)
    if k == "cast":
        lm = None
        if e.attrs.get("strict", True) and table.capacity:
            try:
                lm = table.row_mask()
            except Exception:
                lm = None
        cv = eval_expr(e.children[0], table, ctx)
        dt = e.attrs["dtype"]
        from ..datatype_expr import DataTypeExpr as _DTE, resolve_dtype
        if isinstance(dt, _DTE):
            dt = resolve_dtype(dt, dict(table.schema), cv.dtype)
        return cast_val(cv, dt, e.attrs.get("strict", True),
                        live_mask=lm)
    if k == "ext_to":
        # wrap storage-typed values in an extension dtype (reference:
        # py-polars/src/polars/expr/ext.py:26 ExprExtensionNameSpace.to)
        from ..dtypes import BaseExtension as _BaseExt
        from ..datatype_expr import DataTypeExpr as _DTE, resolve_dtype
        v = eval_expr(e.children[0], table, ctx)
        dt = e.attrs["dtype"]
        if isinstance(dt, _DTE):
            dt = resolve_dtype(dt, dict(table.schema), v.dtype)
        if not isinstance(dt, _BaseExt):
            raise InvalidOperationError(
                f"ext.to expects an extension dtype, got {dt!r}")
        if v.dtype != dt.storage:
            raise InvalidOperationError(
                f"ext.to: input dtype {v.dtype!r} does not match storage "
                f"type {dt.storage!r}")
        return _rebrand_val(v, dt)
    if k == "ext_storage":
        # unwrap to the storage dtype; non-extension inputs pass through
        # (reference: py-polars/src/polars/expr/ext.py:43 .storage)
        from ..dtypes import BaseExtension as _BaseExt
        v = eval_expr(e.children[0], table, ctx)
        if isinstance(v.dtype, _BaseExt):
            return _rebrand_val(v, v.dtype.storage)
        return v
    if k == "binary":
        l = eval_expr(e.children[0], table, ctx)
        r = eval_expr(e.children[1], table, ctx)
        if l.is_scalar != r.is_scalar:
            # broadcasting handled by jnp on (1,) vs (capacity,)
            pass
        return _eval_binary(e.attrs["op"], l, r, table)
    if k == "fma":
        a = eval_expr(e.children[0], table, ctx)
        b = eval_expr(e.children[1], table, ctx)
        c = eval_expr(e.children[2], table, ctx)
        return _eval_fma(e.attrs["op"], a, b, c, table)
    if k == "unary":
        return _eval_unary(e.attrs["op"], eval_expr(e.children[0], table, ctx),
                           e.attrs)
    if k == "is_null":
        v = eval_expr(e.children[0], table, ctx)
        data = ~v.valid_or_true() if v.validity is not None else \
            jnp.zeros(v.data.shape, jnp.bool_)
        return Val(Boolean, data, None, None, v.is_scalar, v.live)
    if k == "is_not_null":
        v = eval_expr(e.children[0], table, ctx)
        data = v.valid_or_true() if v.validity is not None else \
            jnp.ones(v.data.shape, jnp.bool_)
        return Val(Boolean, data, None, None, v.is_scalar, v.live)
    if k in ("is_nan", "is_not_nan", "is_finite", "is_infinite"):
        v = eval_expr(e.children[0], table, ctx)
        if not v.dtype.is_float:
            if k in ("is_nan", "is_infinite"):
                data = jnp.zeros(v.data.shape, jnp.bool_)
            else:
                data = jnp.ones(v.data.shape, jnp.bool_)
        else:
            fn = {"is_nan": jnp.isnan, "is_not_nan": lambda a: ~jnp.isnan(a),
                  "is_finite": jnp.isfinite,
                  "is_infinite": jnp.isinf}[k]
            data = fn(v.data)
        return Val(Boolean, data, v.validity, None, v.is_scalar, v.live)
    if k == "fill_null":
        v = eval_expr(e.children[0], table, ctx)
        f = eval_expr(e.children[1], table, ctx)
        if v.validity is None or f.dtype == Null:
            return v
        if v.dtype.is_string:
            a, b = _align_strings(v, f)
            data = jnp.where(v.validity, a.data, jnp.broadcast_to(b.data, a.data.shape))
            return Val(String, data, None, a.sdict, v.is_scalar, v.live)
        tgt = supertype(v.dtype, f.dtype)
        a, b = cast_val(v, tgt), cast_val(f, tgt)
        data = jnp.where(v.validity, a.data, jnp.broadcast_to(b.data, a.data.shape))
        validity = None if b.validity is None else \
            jnp.where(v.validity, True, jnp.broadcast_to(b.validity, a.data.shape))
        return Val(tgt, data, validity, None, v.is_scalar, v.live)
    if k == "fill_null_strategy":
        strat = e.attrs["strategy"]
        inner = e.children[0]
        if strat in ("forward", "backward"):
            wop = "forward_fill" if strat == "forward" else "backward_fill"
            return _eval_window(Expr("window", (inner,), op=wop),
                                eval_expr(inner, table, ctx),
                                _lit_val(None, None), table)
        v = eval_expr(inner, table, ctx)
        if strat in ("zero", "one"):
            fill = _lit_val(0 if strat == "zero" else 1, v.dtype)
            return eval_expr(Expr("fill_null", (inner, Expr("lit", value=0 if strat == "zero" else 1, dtype=None))), table, ctx)
        if strat in ("min", "max", "mean"):
            agg = _eval_agg(Expr("agg", (inner,), agg=strat), v, table)
            data = jnp.where(v.valid_or_true(), v.data,
                             jnp.broadcast_to(cast_val(agg, v.dtype).data, v.data.shape))
            return Val(v.dtype, data, None, v.sdict, v.is_scalar, v.live)
        raise ComputeError(f"unknown fill_null strategy {strat!r}")
    if k == "fill_nan":
        v = eval_expr(e.children[0], table, ctx)
        f = eval_expr(e.children[1], table, ctx)
        if not v.dtype.is_float:
            return v
        fv = cast_val(f, v.dtype)
        data = jnp.where(jnp.isnan(v.data), jnp.broadcast_to(fv.data, v.data.shape),
                         v.data)
        return Val(v.dtype, data, v.validity, None, v.is_scalar, v.live)
    if k == "clip":
        v = eval_expr(e.children[0], table, ctx)
        lo = eval_expr(e.children[1], table, ctx)
        hi = eval_expr(e.children[2], table, ctx)
        data = v.data
        if lo.dtype != Null:
            data = jnp.maximum(data, jnp.broadcast_to(cast_val(lo, v.dtype).data, data.shape))
        if hi.dtype != Null:
            data = jnp.minimum(data, jnp.broadcast_to(cast_val(hi, v.dtype).data, data.shape))
        return Val(v.dtype, data, v.validity, v.sdict, v.is_scalar, v.live)
    if k == "is_in":
        v = eval_expr(e.children[0], table, ctx)
        vals = e.attrs["values"]
        return _eval_is_in(v, vals)
    if k == "is_between":
        v = eval_expr(e.children[0], table, ctx)
        lo = eval_expr(e.children[1], table, ctx)
        hi = eval_expr(e.children[2], table, ctx)
        closed = e.attrs.get("closed", "both")
        lop = jnp.greater_equal if closed in ("both", "left") else jnp.greater
        rop = jnp.less_equal if closed in ("both", "right") else jnp.less
        if v.dtype.is_string:
            a, b = _align_strings(v, lo)
            a2, c = _align_strings(a, hi)
            data = lop(a2.data, jnp.broadcast_to(b.data, a2.data.shape)) & \
                rop(a2.data, jnp.broadcast_to(c.data, a2.data.shape))
        else:
            st = supertype(supertype(v.dtype, lo.dtype), hi.dtype)
            a, b, c = cast_val(v, st), cast_val(lo, st), cast_val(hi, st)
            data = lop(a.data, jnp.broadcast_to(b.data, a.data.shape)) & \
                rop(a.data, jnp.broadcast_to(c.data, a.data.shape))
        validity = _and_valid(_and_valid(v.validity, lo.validity), hi.validity)
        return Val(Boolean, data, validity, None, v.is_scalar, v.live)
    if k == "when_then":
        return _eval_when_then(e, table, ctx)
    if k == "agg":
        v = eval_expr(e.children[0], table, ctx)
        return _eval_agg(e, v, table)
    if k == "table_len":
        mask = table.row_mask()
        return _scalar(UInt32, jnp.sum(mask).astype(jnp.uint32))
    if k == "row_index":
        mask = table.row_mask()
        pos = (jnp.cumsum(mask.astype(jnp.uint32)) - 1).astype(jnp.uint32)
        return Val(UInt32, pos, None, None, False, None)
    if k == "window":
        v = eval_expr(e.children[0], table, ctx)
        fillv = eval_expr(e.children[1], table, ctx)
        byv = eval_expr(e.children[2], table, ctx) \
            if len(e.children) > 2 else None
        return _eval_window(e, v, fillv, table, byv)
    if k == "str":
        return _eval_str(e, eval_expr(e.children[0], table, ctx), table)
    if k == "bin":
        return _eval_bin(e, eval_expr(e.children[0], table, ctx))
    if k == "dt":
        v = eval_expr(e.children[0], table, ctx)
        if e.attrs.get("op") == "combine":
            tv = eval_expr(e.children[1], table, ctx)
            e = Expr("dt", e.children, **{**e.attrs, "__time_val": tv})
        return _eval_dt(e, v, table)
    if k == "list":
        return _eval_list(e, eval_expr(e.children[0], table, ctx), table)
    if k == "list_eval":
        return _eval_list_eval(e, eval_expr(e.children[0], table, ctx),
                               table, ctx)
    if k == "list_filter":
        return _eval_list_filter(e, table, ctx)
    if k == "list_set":
        return _eval_list_set(e, table, ctx)
    if k == "concat_list":
        from ..dtypes import List as ListT
        vals = [_bcast(eval_expr(c, table, ctx), table.capacity)
                for c in e.children]
        cap = table.capacity
        inner = None
        for v in vals:
            d = v.dtype.inner if isinstance(v.dtype, ListT) else v.dtype
            inner = d if inner is None else supertype(inner, d)
        parts, lens_parts, ev_parts = [], [], []
        any_valid = any(v.validity is not None for v in vals) or \
            any(isinstance(v.dtype, ListT) for v in vals)
        for v in vals:
            if isinstance(v.dtype, ListT):
                d2 = v.data
                if repr(v.dtype.inner) != repr(inner):
                    cv = cast_val(Val(v.dtype.inner,
                                      d2.reshape(-1), None, v.sdict), inner)
                    d2 = cv.data.reshape(d2.shape)
                W = d2.shape[1]
                parts.append(d2)
                lens_parts.append(v.lengths)
                inlen = jnp.arange(W)[None, :] < v.lengths[:, None]
                ev_parts.append(v.elem_valid & inlen
                                if v.elem_valid is not None else inlen)
            else:
                cv = cast_val(v, inner)
                parts.append(cv.data[:, None])
                lens_parts.append(jnp.ones(cap, jnp.int32))
                ev_parts.append((cv.validity if cv.validity is not None
                                 else jnp.ones(cap, jnp.bool_))[:, None])
        data2 = jnp.concatenate(parts, axis=1)
        # compact each row's elements to the front (list parts are padded)
        Wt = data2.shape[1]
        evc = jnp.concatenate(ev_parts, axis=1)
        inlen_all = jnp.concatenate(
            [jnp.arange(p.shape[1])[None, :] <
             ln[:, None] for p, ln in zip(parts, lens_parts)], axis=1)
        order = jax.lax.sort(
            ((~inlen_all).astype(jnp.int32),
             jnp.broadcast_to(jnp.arange(Wt, dtype=jnp.int32)[None, :],
                              (cap, Wt))), num_keys=1, is_stable=True,
            dimension=1)[1]
        data2 = jnp.take_along_axis(data2, order, axis=1)
        evc = jnp.take_along_axis(evc & inlen_all, order, axis=1)
        lengths = sum(lens_parts[i] if not isinstance(
            vals[i].dtype, ListT) else vals[i].lengths
            for i in range(len(vals))).astype(jnp.int32)
        sdict = next((v.sdict for v in vals if v.sdict is not None), None)
        row_valid = None
        for v in vals:
            if isinstance(v.dtype, ListT) and v.validity is not None:
                row_valid = _and_valid(row_valid, v.validity)
        ev_out = evc if any_valid else None
        return Val(ListT(inner), data2, row_valid, sdict, False, None,
                   lengths=lengths, elem_valid=ev_out)
    if k == "repeat_by":
        from ..dtypes import List as ListT
        from ..batch import width_for
        v = eval_expr(e.children[0], table, ctx)
        nv = eval_expr(e.children[1], table, ctx)
        cap = table.capacity
        v = _bcast(v, cap)
        counts = jnp.broadcast_to(nv.data, (cap,)).astype(jnp.int32)
        mask = table.row_mask()
        counts = jnp.where(mask, jnp.maximum(counts, 0), 0)
        W = width_for(int(jnp.max(counts)))  # host sync -> nofuse in jit
        data2 = jnp.broadcast_to(v.data[:, None], (cap, W))
        validity = _and_valid(v.validity, nv.validity)
        ev = None
        if v.validity is not None:
            ev = jnp.broadcast_to(v.validity[:, None], (cap, W)) & \
                (jnp.arange(W)[None, :] < counts[:, None])
        return Val(ListT(v.dtype), data2, nv.validity, v.sdict, False,
                   v.live, lengths=counts, elem_valid=ev)
    if k == "int_ranges":
        from ..dtypes import List as ListT
        from ..batch import width_for
        s = eval_expr(e.children[0], table, ctx)
        en = eval_expr(e.children[1], table, ctx)
        step = int(e.attrs.get("step", 1))
        cap = table.capacity
        lo = jnp.broadcast_to(s.data, (cap,)).astype(jnp.int64)
        hi = jnp.broadcast_to(en.data, (cap,)).astype(jnp.int64)
        mask = table.row_mask()
        if step > 0:
            counts = jnp.maximum(-((lo - hi) // step), 0)
        else:
            counts = jnp.maximum(-((hi - lo) // (-step)), 0)
        counts = jnp.where(mask, counts, 0).astype(jnp.int32)
        W = width_for(int(jnp.max(counts)))
        data2 = lo[:, None] + jnp.arange(W, dtype=jnp.int64)[None, :] * step
        validity = _and_valid(s.validity, en.validity)
        return Val(ListT(Int64), data2, validity, None, False, None,
                   lengths=counts)
    if k == "struct":
        from ..dtypes import Struct as StructT
        names = e.attrs["names"]
        fields = {}
        fdts = []
        for name, ch in zip(names, e.children):
            v = _bcast(eval_expr(ch, table, ctx), table.capacity)
            fields[name] = v
            fdts.append((name, v.dtype))
        return Val(StructT(fdts), None, None, None, False, fields=fields)
    if k == "struct_with_fields":
        from ..dtypes import Struct as StructT
        v = eval_expr(e.children[0], table, ctx)
        if v.fields is None:
            raise InvalidOperationError(
                f".struct.with_fields on non-struct {v.dtype!r}")
        fields = dict(v.fields)
        # pl.field(...) refs resolve against the struct's own fields:
        # expose them as mangled columns on an augmented table
        t2 = table
        if any(_has_field_ref(c) for c in e.children[1:]):
            cols2 = dict(table.cols)
            names2 = list(table.names)
            for fn2, fv2 in fields.items():
                mn = f"__pt_field_{fn2}"
                cols2[mn] = val_to_column(
                    _bcast(fv2, table.capacity), table.capacity)
                names2.append(mn)
            t2 = Table(names2, cols2, table.capacity, table._nrows,
                       table.valid, nrows_dev=table.nrows_dev)
        for name, ch in zip(e.attrs["names"], e.children[1:]):
            ch = _bind_field_refs(ch)
            fields[name] = _bcast(eval_expr(ch, t2, ctx), table.capacity)
        return Val(StructT([(n2, f.dtype) for n2, f in fields.items()]),
                   None, v.validity, None, v.is_scalar, v.live,
                   fields=fields)
    if k == "struct_rename":
        from ..dtypes import Struct as StructT
        v = eval_expr(e.children[0], table, ctx)
        if v.fields is None:
            raise InvalidOperationError(
                f".struct.rename_fields on non-struct {v.dtype!r}")
        olds = list(v.fields.keys())
        if e.attrs.get("names") is None:
            fn = e.attrs.get("fn")
            if fn is not None:  # name.map_fields
                new_names = [str(fn(n)) for n in olds]
            else:
                pre = e.attrs.get("prefix", "")
                suf = e.attrs.get("suffix", "")
                new_names = [f"{pre}{n}{suf}" for n in olds]
        else:
            new_names = list(e.attrs["names"])
        if len(new_names) != len(olds):
            raise ComputeError(
                f"rename_fields: {len(new_names)} names for "
                f"{len(olds)} fields")
        fields = {nn: v.fields[on] for nn, on in zip(new_names, olds)}
        return Val(StructT([(nn, f.dtype) for nn, f in fields.items()]),
                   None, v.validity, None, v.is_scalar, v.live,
                   fields=fields)
    if k == "struct_json_encode":
        import json as _json
        v = eval_expr(e.children[0], table, ctx)
        if v.fields is None:
            raise InvalidOperationError(
                f".struct.json_encode on non-struct {v.dtype!r}")
        cap = table.capacity
        cols = {}
        for n2, f in v.fields.items():
            vals = np.asarray(jnp.broadcast_to(f.data, (cap,)))
            fv = np.asarray(jnp.broadcast_to(f.valid_or_true(), (cap,)))
            if f.dtype.is_string:
                dec = (f.sdict or EMPTY_SDICT).decode(vals.astype(np.int32))
                cols[n2] = [dec[i2] if fv[i2] else None for i2 in range(cap)]
            else:
                cols[n2] = [vals[i2].item() if fv[i2] else None
                            for i2 in range(cap)]
        txt = np.array([_json.dumps({n2: cols[n2][i2] for n2 in cols})
                        for i2 in range(cap)], dtype=object)
        codes2, nd = StringDict.encode(txt)
        return Val(String, jnp.asarray(codes2), v.validity, nd,
                   v.is_scalar, v.live)
    if k == "struct_unnest":
        # handled by DataFrame.select expansion; evaluating the bare expr
        # yields the struct itself
        return eval_expr(e.children[0], table, ctx)
    if k == "struct_field":
        v = eval_expr(e.children[0], table, ctx)
        if v.fields is None:
            raise InvalidOperationError(
                f".struct.field on non-struct dtype {v.dtype!r}")
        name = e.attrs["name"]
        if name not in v.fields:
            raise ComputeError(f"struct has no field {name!r}")
        f = v.fields[name]
        validity = _and_valid(f.validity, v.validity)
        return Val(f.dtype, f.data, validity, f.sdict, v.is_scalar, v.live,
                   lengths=f.lengths, elem_valid=f.elem_valid,
                   fields=f.fields)
    if k == "expr_filter":
        v = eval_expr(e.children[0], table, ctx)
        p = eval_expr(e.children[1], table, ctx)
        plive = p.data & p.valid_or_true()
        live = plive if v.live is None else (v.live & plive)
        return Val(v.dtype, v.data, v.validity, v.sdict, v.is_scalar, live)
    if k == "drop_nulls":
        v = eval_expr(e.children[0], table, ctx)
        if v.validity is None:
            return v
        live = v.validity if v.live is None else (v.live & v.validity)
        return Val(v.dtype, v.data, v.validity, v.sdict, v.is_scalar, live)
    if k == "expr_slice":
        v = eval_expr(e.children[0], table, ctx)
        if v.is_scalar:
            return v
        mask = table.row_mask() if v.live is None else \
            (table.row_mask() & v.live)
        off = int(e.attrs["offset"])
        length = e.attrs.get("length")
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        n_live = jnp.sum(mask.astype(jnp.int32))
        start = jnp.where(jnp.int32(off) >= 0, jnp.int32(off),
                          jnp.maximum(n_live + off, 0))
        keep = mask & (rank >= start)
        if length is not None:
            keep = keep & (rank < start + int(length))
        return Val(v.dtype, v.data, v.validity, v.sdict, False, keep,
                   lengths=v.lengths, elem_valid=v.elem_valid,
                   fields=v.fields)
    if k == "hash":
        v = eval_expr(e.children[0], table, ctx)
        from ..ops.hashing import hash_array
        return Val(UInt32, hash_array(v.data, e.attrs.get("seed", 0)),
                   v.validity, None, v.is_scalar, v.live)
    if k in ("is_duplicated", "is_unique", "is_first_distinct",
             "is_last_distinct"):
        return _eval_distinct_flags(e, table, ctx)
    if k == "arg_true":
        v = eval_expr(e.children[0], table, ctx)
        if not v.dtype.is_bool:
            raise InvalidOperationError(f"arg_true on {v.dtype!r}")
        mask = table.row_mask() if v.live is None else \
            (table.row_mask() & v.live)
        # index among live rows; keep only rows where the predicate holds
        pos = (jnp.cumsum(mask.astype(jnp.uint32)) - 1).astype(jnp.uint32)
        keep = mask & v.data & v.valid_or_true()
        return Val(UInt32, pos, None, None, False, keep)
    if k == "bounds":
        v = eval_expr(e.children[0], table, ctx)
        lo, hi = _type_bounds(v.data.dtype)
        val = lo if e.attrs["side"] == "lower" else hi
        return _scalar(v.dtype, val)
    if k == "to_physical":
        v = eval_expr(e.children[0], table, ctx)
        from ..dtypes import Categorical, Time
        dt = v.dtype
        if dt.is_string or isinstance(dt, Categorical):
            return Val(UInt32, v.data.astype(jnp.uint32), v.validity, None,
                       v.is_scalar, v.live)
        phys = {repr(Date): Int32, repr(Boolean): Boolean}.get(repr(dt))
        if isinstance(dt, Datetime) or isinstance(dt, Duration) or dt == Time:
            phys = Int64
        if phys is None:
            return v
        return Val(phys, v.data, v.validity, None, v.is_scalar, v.live)
    if k == "sample":
        return _eval_sample(e, table, ctx)
    if k == "extend_constant":
        v = eval_expr(e.children[0], table, ctx)
        f = eval_expr(e.children[1], table, ctx)
        n = int(e.attrs["n"])
        if v.is_scalar:
            raise InvalidOperationError("extend_constant on scalar")
        fv = cast_val(f, v.dtype) if f.dtype != Null else f
        tailv = jnp.broadcast_to(fv.data if f.dtype != Null
                                 else jnp.zeros(1, v.data.dtype), (n,))
        data = jnp.concatenate([v.data, tailv.astype(v.data.dtype)])
        validity = None
        if v.validity is not None or f.dtype == Null:
            validity = jnp.concatenate([
                v.valid_or_true(),
                jnp.full((n,), f.dtype != Null, jnp.bool_)])
        base_live = table.row_mask() if v.live is None \
            else (table.row_mask() & v.live)
        live = jnp.concatenate([base_live, jnp.ones(n, jnp.bool_)])
        return Val(v.dtype, data, validity, v.sdict, False, live)
    if k == "append":
        l = eval_expr(e.children[0], table, ctx)
        r = eval_expr(e.children[1], table, ctx)
        st = supertype(l.dtype, r.dtype)
        if l.dtype.is_string and r.dtype.is_string:
            a, b = _align_strings(l, r)
        else:
            a, b = cast_val(l, st), cast_val(r, st)
        data = jnp.concatenate([a.data, jnp.atleast_1d(b.data)])
        validity = None
        if a.validity is not None or b.validity is not None:
            validity = jnp.concatenate([a.valid_or_true(),
                                        jnp.atleast_1d(b.valid_or_true())])
        mask = table.row_mask()
        al = mask if a.live is None else (mask & a.live)
        if b.is_scalar:
            bl = jnp.ones(jnp.atleast_1d(b.data).shape[0], jnp.bool_)
        else:
            bl = mask if b.live is None else (mask & b.live)
        live = jnp.concatenate([al, bl])
        return Val(a.dtype if not l.dtype.is_string else String, data,
                   validity, a.sdict, False, live)
    if k == "field":
        raise InvalidOperationError(
            "pl.field(...) is only valid inside struct.with_fields")
    if k == "business_day_count":
        s = eval_expr(e.children[0], table, ctx)
        en = eval_expr(e.children[1], table, ctx)
        if s.dtype != Date or en.dtype != Date:
            s = cast_val(s, Date)
            en = cast_val(en, Date)

        def W(d):
            dm = d.astype(jnp.int64) + 3  # epoch day 0 is a Thursday
            return 5 * jnp.floor_divide(dm, 7) + \
                jnp.minimum(jnp.remainder(dm, 7), 5)
        out2 = (W(en.data) - W(s.data)).astype(jnp.int32)
        return Val(Int32, out2, _and_valid(s.validity, en.validity), None,
                   s.is_scalar and en.is_scalar,
                   s.live if s.live is not None else en.live)
    if k == "rolling_pair":
        return _eval_rolling_pair(e, table, ctx)
    if k == "map_elements":
        return _eval_map_elements(e, table, ctx)
    if k == "cumulative_eval":
        return _eval_cumulative(e, table, ctx)
    if k == "replace_strict":
        v = eval_expr(e.children[0], table, ctx)
        old, new = e.attrs["old"], e.attrs["new"]
        default = e.attrs.get("default")
        if v.dtype.is_string:
            sd = v.sdict or EMPTY_SDICT
            mapping = {o: n for o, n in zip(old, new)}
            if default is None:
                mask = np.asarray(table.row_mask() if v.live is None
                                  else (table.row_mask() & v.live))
                codes = np.asarray(v.data)
                ok = mask & np.asarray(v.valid_or_true()) & (codes >= 0)
                used = np.unique(codes[ok])
                missing = [s for s in (sd.values[used] if len(used) else [])
                           if s not in mapping]
                if missing:
                    raise InvalidOperationError(
                        f"replace_strict: value {missing[0]!r} not in "
                        "mapping and no default given")
            nd, remap = sd.map_to_strings(
                lambda s: mapping.get(s, default))
            rm = jnp.asarray(remap) if len(remap) else jnp.zeros(1, jnp.int32)
            data = jnp.where(v.data >= 0,
                             rm[jnp.clip(v.data, 0, max(len(remap) - 1, 0))],
                             NULL_CODE)
            return Val(String, data, v.validity, nd, v.is_scalar, v.live)
        matched = jnp.zeros(v.data.shape, jnp.bool_)
        tgt = None
        for n2 in new:
            t2 = _lit_val(n2, None).dtype
            tgt = t2 if tgt is None else supertype(tgt, t2)
        if default is not None:
            tgt = supertype(tgt, _lit_val(default, None).dtype)
        stor = _stor(tgt)
        data = jnp.zeros(v.data.shape, stor)
        for o, n2 in zip(old, new):
            hit = v.data == o
            matched = matched | hit
            data = jnp.where(hit, jnp.asarray(n2, stor), data)
        validity = v.validity
        if default is not None:
            data = jnp.where(matched, data, jnp.asarray(default, stor))
        else:
            live2 = table.row_mask() if v.live is None \
                else (table.row_mask() & v.live)
            bad = np.asarray(live2 & v.valid_or_true() & ~matched)
            if bad.any():
                badv = np.asarray(v.data)[bad][0]
                raise InvalidOperationError(
                    f"replace_strict: value {badv!r} not in mapping "
                    "and no default given")
        return Val(tgt, data, validity, None, v.is_scalar, v.live)
    if k in ("cut", "qcut"):
        return _eval_cut(e, eval_expr(e.children[0], table, ctx), table)
    if k == "hist":
        return _eval_hist(e, eval_expr(e.children[0], table, ctx), table)
    if k == "gather_every":
        v = eval_expr(e.children[0], table, ctx)
        n = int(e.attrs["n"])
        off = int(e.attrs.get("offset", 0))
        live = table.row_mask() if v.live is None else \
            (table.row_mask() & v.live)
        rank = jnp.cumsum(live.astype(jnp.int32)) - 1
        keep = live & (rank >= off) & ((rank - off) % n == 0)
        return Val(v.dtype, v.data, v.validity, v.sdict, v.is_scalar, keep,
                   lengths=v.lengths, elem_valid=v.elem_valid,
                   fields=v.fields)
    if k == "shrink_dtype":
        v = eval_expr(e.children[0], table, ctx)
        return _eval_shrink_dtype(v, table)
    if k == "datetime_components":
        # pl.datetime(year, month, day, ...) — on-device civil calendar
        y = eval_expr(e.children[0], table, ctx)
        mo = eval_expr(e.children[1], table, ctx)
        d = eval_expr(e.children[2], table, ctx)
        cap = table.capacity
        ys = jnp.broadcast_to(y.data.astype(jnp.int64), (cap,)) \
            if not (y.is_scalar and mo.is_scalar and d.is_scalar) \
            else y.data.astype(jnp.int64)
        ms = jnp.broadcast_to(mo.data.astype(jnp.int64), ys.shape)
        ds_ = jnp.broadcast_to(d.data.astype(jnp.int64), ys.shape)
        days = T.civil_to_days(ys, ms, ds_).astype(jnp.int64)
        tu = e.attrs.get("time_unit", "us")
        per_s = T.UNIT_PER_SECOND[tu]
        sec = (e.attrs.get("hour", 0) * 3600 + e.attrs.get("minute", 0) * 60
               + e.attrs.get("second", 0))
        sub = e.attrs.get("microsecond", 0) * (per_s // 1_000_000)
        epoch = days * (86_400 * per_s) + sec * per_s + sub
        validity = _and_valid(_and_valid(y.validity, mo.validity), d.validity)
        return Val(Datetime(tu), epoch, validity, None,
                   y.is_scalar and mo.is_scalar and d.is_scalar)
    if k == "search_sorted":
        v = eval_expr(e.children[0], table, ctx)
        elem = eval_expr(e.children[1], table, ctx)
        mask = table.row_mask() if v.live is None else \
            (table.row_mask() & v.live)
        perm = jnp.argsort(~mask, stable=True)
        packed = v.data[perm]
        n = jnp.sum(mask)
        # pad rows past the live prefix hold garbage; overwrite with +max
        # so the binary search stays well-defined
        _, hi_b = _type_bounds(packed.dtype)
        packed = jnp.where(jnp.arange(packed.shape[0]) < n, packed, hi_b)
        side = "left" if e.attrs.get("side") == "left" else "right"
        pos = jnp.searchsorted(packed, elem.data, side=side)
        pos = jnp.minimum(pos, n).astype(jnp.uint32)
        return Val(UInt32, pos, elem.validity, None, elem.is_scalar,
                   elem.live)
    if k == "sort_self":
        v = eval_expr(e.children[0], table, ctx)
        return _eval_sort_self(e, v, table)
    if k == "sort_by":
        return _eval_sort_by(e, table, ctx)
    if k == "map_batches":
        v = eval_expr(e.children[0], table, ctx)
        fn = e.attrs["fn"]
        data = fn(v.data)
        rd = e.attrs.get("return_dtype") or v.dtype
        from ..datatype_expr import DataTypeExpr as _DTE, resolve_dtype
        if isinstance(rd, _DTE):
            rd = resolve_dtype(rd, dict(table.schema), v.dtype)
        return Val(rd, data, v.validity, None, v.is_scalar, v.live)
    if k == "replace":
        v = eval_expr(e.children[0], table, ctx)
        old, new = e.attrs["old"], e.attrs["new"]
        data = v.data
        if v.dtype.is_string:
            sd = v.sdict or EMPTY_SDICT
            mapping = {o: n for o, n in zip(old, new)}
            nd, remap = sd.map_to_strings(lambda s: mapping.get(s, s))
            rm = jnp.asarray(remap) if len(remap) else jnp.zeros(1, jnp.int32)
            data = jnp.where(data >= 0, rm[jnp.clip(data, 0, max(len(remap) - 1, 0))], NULL_CODE)
            return Val(String, data, v.validity, nd, v.is_scalar, v.live)
        for o, n in zip(old, new):
            data = jnp.where(v.data == o, jnp.asarray(n, data.dtype), data)
        return Val(v.dtype, data, v.validity, None, v.is_scalar, v.live)
    if k == "over":
        from ..ops.window_over import eval_over
        return eval_over(e, table, ctx)
    if k == "reshape":
        return _eval_reshape(e, table, ctx)
    if k == "concat_str":
        return _eval_concat_str(e, table, ctx)
    if k == "struct":
        raise InvalidOperationError("struct dtype not supported yet")
    if k == "map_groups_udf":
        # map_groups/plugin UDF outside a group-by: the whole frame is a
        # single group (reference: polars evaluates map_groups exprs in
        # select context over the full column set)
        from ..api.frame import DataFrame as _DF
        from ..api.series import Series as _Series
        from ..batch import Column as _Col
        fn = e.attrs["fn"]
        returns_scalar = e.attrs.get("returns_scalar", False)
        series = []
        for ci, c in enumerate(e.children):
            v = eval_expr(c, table, ctx)
            cap = table.capacity
            data = v.data if (hasattr(v.data, "shape") and v.data.shape
                              and v.data.shape[0] == cap) else \
                jnp.broadcast_to(v.data, (cap,) + tuple(
                    v.data.shape[1:] if hasattr(v.data, "shape") else ()))
            validity = v.validity
            if validity is not None and validity.shape[0] != cap:
                validity = jnp.broadcast_to(validity, (cap,))
            t1 = Table([f"x{ci}"],
                       {f"x{ci}": _Col(v.dtype, data, validity, v.sdict,
                                       lengths=v.lengths,
                                       elem_valid=v.elem_valid,
                                       fields=v.fields)},
                       cap, table._nrows, v.live if v.live is not None
                       else table.valid,
                       nrows_dev=None if v.live is not None
                       else table.nrows_dev)
            series.append(_DF._from_table(t1).get_column(f"x{ci}"))
        out = fn(series)
        if not isinstance(out, _Series):
            out = _Series("", out if isinstance(out, (list, tuple))
                          else [out])
        if returns_scalar and len(out) == 1:
            oc = out._col
            return Val(oc.dtype, oc.data[:1], None if oc.validity is None
                       else oc.validity[:1], oc.sdict, True)
        oc = out.to_frame()._table
        col = oc.column(oc.names[0])
        col = col.take(jnp.arange(table.capacity))
        return Val(col.dtype, col.data, col.validity, col.sdict, False,
                   lengths=col.lengths, elem_valid=col.elem_valid,
                   fields=col.fields)
    raise ComputeError(f"cannot evaluate expr kind {k!r}")


def _eval_reshape(e: Expr, table: Table, ctx: str) -> Val:
    """reshape((n|-1, w)): flat column -> fixed-width Array rows; (n,)
    on a flat column is the identity (reference: Expr.reshape,
    `py-polars/src/polars/expr/expr.py:9864`). The element count is one
    host-synced scalar (same pattern as join output sizing)."""
    dims = e.attrs["dims"]
    v = eval_expr(e.children[0], table, ctx)
    if len(dims) == 1:
        if v.lengths is None and v.fields is None:
            return v
        raise InvalidOperationError(
            "reshape to 1-D of a nested column is not supported yet; "
            "use explode()")
    if len(dims) != 2:
        raise InvalidOperationError(
            "reshape with more than 2 dimensions is not supported yet")
    if v.lengths is not None or v.fields is not None:
        raise InvalidOperationError("cannot reshape a nested column")
    if ctx != "select":
        raise InvalidOperationError(
            "reshape changes the frame length; only valid in a select "
            "context")
    n0, w = dims
    if w <= 0:
        raise InvalidOperationError(
            "only the first reshape dimension may be -1")
    from ..dtypes import Array as ArrayT
    cap = table.capacity
    data = v.data if v.data.shape[0] == cap else \
        jnp.broadcast_to(v.data, (cap,))
    mask = v.live if v.live is not None else table.row_mask()
    order = jnp.argsort(~mask, stable=True)  # live values to the front
    data = data[order]
    ev = None
    if v.validity is not None:
        vv = v.validity if v.validity.shape[0] == cap else \
            jnp.broadcast_to(v.validity, (cap,))
        ev = vv[order]
    n_live = int(jnp.sum(mask))
    if n_live % w != 0:
        raise InvalidOperationError(
            f"cannot reshape {n_live} elements into rows of width {w}")
    rows = n_live // w
    if n0 not in (-1, rows):
        raise InvalidOperationError(
            f"cannot reshape {n_live} elements into ({n0}, {w})")
    rcap = cap // w
    d2 = data[:rcap * w].reshape(rcap, w)
    if rcap < cap:
        d2 = jnp.concatenate(
            [d2, jnp.zeros((cap - rcap, w), d2.dtype)], axis=0)
    if ev is not None:
        e2 = ev[:rcap * w].reshape(rcap, w)
        if rcap < cap:
            e2 = jnp.concatenate(
                [e2, jnp.zeros((cap - rcap, w), jnp.bool_)], axis=0)
    else:
        e2 = None
    live = jnp.arange(cap) < rows
    return Val(ArrayT(v.dtype, w), d2, None, v.sdict, False, live=live,
               lengths=jnp.full(cap, w, jnp.int32), elem_valid=e2)


def _eval_concat_str(e: Expr, table: Table, ctx: str) -> Val:
    """String concatenation via host formatting (strings are host-side
    dictionaries; the combine is O(rows) host work, documented)."""
    sep = e.attrs.get("separator", "")
    cap = table.capacity
    parts = []
    validity = None
    for c in e.children:
        v = eval_expr(c, table, ctx)
        data = v.data if v.data.shape[0] == cap else \
            jnp.broadcast_to(v.data, (cap,))
        vals = np.asarray(data)
        if v.dtype.is_string:
            sd = v.sdict or EMPTY_SDICT
            txt = sd.decode(vals.astype(np.int32))
            txt = np.array(["" if t is None else t for t in txt], dtype=object)
        elif v.dtype.is_float:
            txt = np.array([_fmt_float(x) for x in vals], dtype=object)
        elif v.dtype.is_bool:
            txt = np.where(vals, "true", "false").astype(object)
        else:
            txt = vals.astype(str).astype(object)
        parts.append(txt)
        if v.validity is not None:
            vv = v.validity if v.validity.shape[0] == cap else \
                jnp.broadcast_to(v.validity, (cap,))
            validity = _and_valid(validity, vv)
    combined = parts[0]
    for p in parts[1:]:
        combined = np.array([a + sep + b for a, b in zip(combined, p)],
                            dtype=object)
    codes, sd = StringDict.encode(combined, np.ones(len(combined), bool))
    return Val(String, jnp.asarray(codes), validity, sd, False)


def _eval_is_in(v: Val, vals) -> Val:
    if v.dtype.is_string:
        sd = v.sdict or EMPTY_SDICT
        codes = [sd.find(s) for s in vals]
        codes = [c for c in codes if c is not None]
        if not codes:
            data = jnp.zeros(v.data.shape, jnp.bool_)
        else:
            arr = jnp.asarray(np.array(sorted(codes), np.int32))
            i = jnp.searchsorted(arr, v.data)
            i = jnp.clip(i, 0, len(codes) - 1)
            data = arr[i] == v.data
        return Val(Boolean, data, v.validity, None, v.is_scalar, v.live)
    arr = np.asarray([x for x in vals if x is not None])
    if arr.size == 0:
        data = jnp.zeros(v.data.shape, jnp.bool_)
    else:
        sa = jnp.asarray(np.sort(arr.astype(np.asarray(v.data).dtype)))
        i = jnp.clip(jnp.searchsorted(sa, v.data), 0, sa.shape[0] - 1)
        data = sa[i] == v.data
    has_null = any(x is None for x in vals)
    validity = v.validity
    if has_null and v.validity is not None:
        data = jnp.where(v.validity, data, True)
        validity = None
    return Val(Boolean, data, validity, None, v.is_scalar, v.live)


def _eval_when_then(e: Expr, table: Table, ctx: str, evalf=None,
                    cap: int = None) -> Val:
    """when/then/otherwise selection. `evalf`/`cap` override the child
    evaluator and output length (group-agg context evaluates children
    per group over out_cap slots)."""
    if evalf is None:
        evalf = lambda c: eval_expr(c, table, ctx)  # noqa: E731
    nb = e.attrs["n_branches"]
    conds = [evalf(c) for c in e.children[:nb]]
    vals = [evalf(c) for c in e.children[nb:]]
    # unify dtypes
    out_dt = Null
    for v in vals:
        if v.dtype != Null:
            out_dt = v.dtype if out_dt == Null else (
                String if out_dt.is_string else supertype(out_dt, v.dtype))
    if out_dt == Null:
        out_dt = Boolean
    if cap is None:
        cap = table.capacity
    if out_dt.is_string:
        # align all dictionaries pairwise onto one merged dict
        base = vals[0] if vals[0].dtype.is_string else None
        merged = EMPTY_SDICT
        aligned = []
        cur = Val(String, jnp.zeros((1,), jnp.int32), None, merged, True)
        for v in vals:
            if v.dtype == Null:
                aligned.append(None)
                continue
            cur, vv = _align_strings(cur, v)
            aligned.append(vv)
        # realign earlier ones to final dict
        final_sd = cur.sdict
        aligned2 = []
        for v in aligned:
            if v is None:
                aligned2.append(None)
            else:
                _, vv = _align_strings(cur, v)
                aligned2.append(vv)
        vals_c = aligned2
        sdict = final_sd
    else:
        vals_c = [cast_val(v, out_dt) if v.dtype != Null else None for v in vals]
        sdict = None

    data = jnp.zeros((cap,), dtype=_stor(out_dt) if not out_dt.is_string else jnp.int32)
    validity = jnp.zeros((cap,), dtype=jnp.bool_)
    decided = jnp.zeros((cap,), dtype=jnp.bool_)
    for i, c in enumerate(conds):
        cd = jnp.broadcast_to(c.data, (cap,))
        cv = jnp.broadcast_to(c.valid_or_true(), (cap,))
        takes = ~decided & cd & cv
        vv = vals_c[i]
        if vv is not None:
            data = jnp.where(takes, jnp.broadcast_to(vv.data, (cap,)), data)
            validity = jnp.where(takes, jnp.broadcast_to(vv.valid_or_true(), (cap,)),
                                 validity)
        decided = decided | (cd & cv)
    # otherwise
    ov = vals_c[-1]
    rest = ~decided
    if ov is not None:
        data = jnp.where(rest, jnp.broadcast_to(ov.data, (cap,)), data)
        validity = jnp.where(rest, jnp.broadcast_to(ov.valid_or_true(), (cap,)),
                             validity)
    return Val(out_dt, data, validity, sdict, False)


def _eval_sample(e: Expr, table: Table, ctx: str) -> Val:
    """Bernoulli-free exact sampling: permute live rows with jax.random,
    keep the first n (shuffle = keep all, permuted)."""
    v = eval_expr(e.children[0], table, ctx)
    mask = table.row_mask() if v.live is None else (table.row_mask() & v.live)
    cap = v.data.shape[0]
    seed = e.attrs.get("seed")
    key = jax.random.PRNGKey(0 if seed is None else int(seed))
    u = jax.random.uniform(key, (cap,))
    # dead rows last, random order among live
    order = jnp.argsort(jnp.where(mask, u, 2.0))
    n_live = jnp.sum(mask)
    n = e.attrs.get("n")
    frac = e.attrs.get("fraction")
    if n is None:
        n_take = (n_live * (1.0 if frac is None else float(frac))
                  ).astype(jnp.int32)
    else:
        n_take = jnp.minimum(jnp.int32(int(n)), n_live)
    if e.attrs.get("with_replacement"):
        key2 = jax.random.split(key)[0]
        live_idx = order  # live rows at the front
        pick = jax.random.randint(key2, (cap,), 0,
                                  jnp.maximum(n_live, 1))
        src = live_idx[pick]
        keep = jnp.arange(cap) < n_take
        data = v.data[src]
        validity = None if v.validity is None else v.validity[src]
        return Val(v.dtype, data, validity, v.sdict, False, keep)
    data = v.data[order]
    validity = None if v.validity is None else v.validity[order]
    keep = jnp.arange(cap) < n_take
    return Val(v.dtype, data, validity, v.sdict, False, keep)


def _eval_map_elements(e: Expr, table: Table, ctx: str) -> Val:
    """Host-side per-element UDF (reference: py-polars Expr.map_elements).
    Pulls the column to host, applies, re-encodes; unfusable by design."""
    v = eval_expr(e.children[0], table, ctx)
    fn = e.attrs["fn"]
    skip_nulls = e.attrs.get("skip_nulls", True)
    mask = np.asarray(table.row_mask() if v.live is None
                      else (table.row_mask() & v.live))
    vals = np.asarray(v.data)
    valid = np.asarray(v.valid_or_true())
    if v.dtype.is_string:
        sd = v.sdict or EMPTY_SDICT
        dec = sd.decode(vals.astype(np.int32))
        src = [None if (not va) else s for s, va in zip(dec, valid)]
    else:
        src = [x.item() if va else None for x, va in zip(vals, valid)]
    out = [fn(s) if (s is not None or not skip_nulls) else None
           for s in src]
    rd = e.attrs.get("return_dtype")
    from ..api.series import Series
    res = Series("", [o if m else None for o, m in zip(out, mask)],
                 dtype=rd)._col
    return Val(res.dtype, res.data, res.validity, res.sdict, False, v.live)


def _eval_cumulative(e: Expr, table: Table, ctx: str) -> Val:
    """cumulative_eval: run an aggregation expr over every prefix. Host
    loop, O(n * eval) — matches the reference's documented slowness
    (py-polars Expr.cumulative_eval warning)."""
    from ..batch import Table as _Table, Column as _Column
    v = eval_expr(e.children[0], table, ctx)
    inner = e.children[1]
    min_samples = int(e.attrs.get("min_samples", 1))
    mask = np.asarray(table.row_mask() if v.live is None
                      else (table.row_mask() & v.live))
    idxs = np.nonzero(mask)[0]
    col = _Column(v.dtype, v.data, v.validity, v.sdict)
    outs, valids = [], []
    sub = inner  # uses pl.element() == col("__pt_element__") refs
    for k2 in range(1, len(idxs) + 1):
        take = idxs[:k2]
        pref = _Column(v.dtype, v.data[jnp.asarray(take)],
                       None if v.validity is None
                       else v.validity[jnp.asarray(take)], v.sdict)
        t2 = _Table(["__pt_element__"], {"__pt_element__": pref},
                    len(take), len(take), None)
        if k2 < min_samples:
            outs.append(None)
            continue
        r = eval_expr(sub, t2, "select")
        rv = np.asarray(r.data)[:1]
        ok = True if r.validity is None else bool(np.asarray(r.validity)[0])
        outs.append(rv[0].item() if ok else None)
    from ..api.series import Series
    full = [None] * int(mask.shape[0])
    for i, o in zip(idxs, outs):
        full[int(i)] = o
    res = Series("", full)._col
    return Val(res.dtype, res.data, res.validity, res.sdict, False, v.live)


def _has_field_ref(e: Expr) -> bool:
    if e.kind == "field":
        return True
    return any(_has_field_ref(c) for c in e.children)


def _bind_field_refs(e: Expr) -> Expr:
    if e.kind == "field":
        return Expr("col", name=f"__pt_field_{e.attrs['name']}")
    if not e.children:
        return e
    return Expr(e.kind, tuple(_bind_field_refs(c) for c in e.children),
                **e.attrs)


def _eval_rolling_pair(e: Expr, table: Table, ctx: str) -> Val:
    """rolling_cov / rolling_corr over two columns (reference:
    polars-compute rolling pairwise moments)."""
    a = eval_expr(e.children[0], table, ctx)
    b = eval_expr(e.children[1], table, ctx)
    mask, perm, inv, count = _live_order(table)
    cap = table.capacity
    x = jnp.broadcast_to(a.data, (cap,))[perm]
    y = jnp.broadcast_to(b.data, (cap,))[perm]
    xv = (jnp.broadcast_to(a.valid_or_true(), (cap,)) &
          jnp.broadcast_to(b.valid_or_true(), (cap,)))[perm] & \
        (jnp.arange(cap) < count)
    w = int(e.attrs["window_size"])
    min_p = e.attrs.get("min_samples") or w
    ddof = e.attrs.get("ddof", 1)
    acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    xf = jnp.where(xv, x, 0).astype(acc)
    yf = jnp.where(xv, y, 0).astype(acc)
    n = _roll_win(xv.astype(acc), w, "add")
    sx = _roll_win(xf, w, "add")
    sy = _roll_win(yf, w, "add")
    sxy = _roll_win(xf * yf, w, "add")
    nn = jnp.maximum(n, 1)
    cov = (sxy - sx * sy / nn) / jnp.maximum(nn - ddof, 1)
    validity = (n >= min_p) & (n > ddof) & (jnp.arange(cap) < count)
    if e.attrs["stat"] == "cov":
        data = cov
    else:
        sx2 = _roll_win(xf * xf, w, "add")
        sy2 = _roll_win(yf * yf, w, "add")
        vx = jnp.maximum((sx2 - sx * sx / nn) / jnp.maximum(nn - ddof, 1), 0)
        vy = jnp.maximum((sy2 - sy * sy / nn) / jnp.maximum(nn - ddof, 1), 0)
        den = jnp.sqrt(vx * vy)
        data = cov / jnp.where(den == 0, 1, den)
        validity = validity & (den > 0)
    stor = _stor(Float64)
    return Val(Float64, data.astype(stor)[inv], validity[inv], None,
               False, a.live if a.live is not None else b.live)


def _eval_distinct_flags(e: Expr, table: Table, ctx: str) -> Val:
    v = eval_expr(e.children[0], table, ctx)
    mask = table.row_mask()
    x = v.data
    cap = x.shape[0]
    xv = v.valid_or_true() & mask
    # sort by (dead-last, null, value, idx)
    idx = jnp.arange(cap, dtype=jnp.int32)
    dead = (~mask).astype(jnp.int32)
    nullk = (~v.valid_or_true()).astype(jnp.int32)
    sk0, sk1, sx, si = jax.lax.sort(
        (dead, nullk, x, idx), num_keys=3, is_stable=True)
    newg = (jnp.arange(cap) == 0) | (sx != jnp.roll(sx, 1)) | \
        (sk1 != jnp.roll(sk1, 1)) | (sk0 != jnp.roll(sk0, 1))
    # per-row run length from boundary positions (scatter-free)
    pos = jnp.arange(cap, dtype=jnp.int32)
    is_last = jnp.concatenate([newg[1:], jnp.ones(1, jnp.bool_)])
    start_row = jax.lax.cummax(jnp.where(newg, pos, -1))
    end_row = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(is_last, pos, cap + 1))))
    gcount = end_row - start_row + 1
    if e.kind == "is_duplicated":
        flag = gcount > 1
    elif e.kind == "is_unique":
        flag = gcount == 1
    elif e.kind == "is_last_distinct":
        flag = is_last
    else:  # is_first_distinct
        flag = newg
    # writeback via sort (TPU scatters serialize)
    _, out_w = jax.lax.sort(
        (si.astype(jnp.int32), flag.astype(jnp.uint32)), num_keys=1)
    return Val(Boolean, out_w != 0, None, None, False, v.live)


def _eval_sort_by(e: Expr, table: Table, ctx: str) -> Val:
    """`expr.sort_by(*keys)`: reorder self by the key columns (reference:
    polars-plan SortBy expr)."""
    from ..ops.keycode import encode_key_words
    v = eval_expr(e.children[0], table, ctx)
    n_by = e.attrs.get("n_by", len(e.children) - 1)
    desc = e.attrs.get("descending", False)
    descs = desc if isinstance(desc, (list, tuple)) else [desc] * n_by
    nulls_last = e.attrs.get("nulls_last", False)
    mask, perm, inv, count = _live_order(table)
    cap = table.capacity
    idx = jnp.arange(cap)
    live = idx < count
    dead = (~live).astype(jnp.uint32)
    words = [dead]
    for i in range(n_by):
        bv = eval_expr(e.children[1 + i], table, ctx)
        b = jnp.broadcast_to(bv.data, (cap,))[perm]
        bvv = jnp.broadcast_to(bv.valid_or_true(), (cap,))[perm]
        words.extend(encode_key_words(b, bvv, bool(descs[i]), nulls_last))
    x = v.data[perm]
    xv = v.valid_or_true()[perm]
    out = jax.lax.sort(tuple(words) + (x, xv.astype(jnp.int32)),
                       num_keys=len(words), is_stable=True)
    sx, sv = out[-2], out[-1].astype(jnp.bool_)
    data = jnp.where(live, sx, x)
    validity = jnp.where(live, sv, xv)
    return Val(v.dtype, data[inv],
               validity[inv] if v.validity is not None else None,
               v.sdict, False, v.live)


def _eval_sort_self(e: Expr, v: Val, table: Table) -> Val:
    desc = e.attrs.get("descending", False)
    nulls_last = e.attrs.get("nulls_last", False)
    mask, perm, inv, count = _live_order(table)
    x = v.data[perm]
    xv = v.valid_or_true()[perm]
    cap = x.shape[0]
    live = jnp.arange(cap) < count
    dead = (~live).astype(jnp.uint32)
    from ..ops.keycode import encode_key_words
    words = [dead] + encode_key_words(x, xv, desc, nulls_last)
    ops = tuple(words) + (x, xv.astype(jnp.int32))
    out = jax.lax.sort(ops, num_keys=len(words), is_stable=True)
    sx, sv = out[-2], out[-1].astype(jnp.bool_)
    data = jnp.where(live, sx, x)
    validity = jnp.where(live, sv, xv)
    return Val(v.dtype, data[inv],
               validity[inv] if v.validity is not None else None,
               v.sdict, False, v.live)


def eval_to_column(e: Expr, table: Table, ctx: str = "select") -> Tuple[str, Column, bool]:
    """Evaluate and wrap as a named Column. Returns (name, column, is_scalar)."""
    name = meta.output_name(e)
    v = eval_expr(e, table, ctx)
    cap = v.data.shape[0] if v.data is not None \
        else next(iter(v.fields.values())).data.shape[0]
    col = val_to_column(v, cap)
    return name, col, v.is_scalar


_CSE_STACK: list = []


class cse_scope:
    """Context manager providing a Val cache for `cse_cached` exprs."""

    def __enter__(self):
        _CSE_STACK.append({})
        return self

    def __exit__(self, *exc):
        _CSE_STACK.pop()
        return False


_CSE_TRIVIAL = {"col", "lit", "wildcard", "cols", "nth", "dtype_cols",
                "table_len", "alias", "name_map", "name_keep"}


def cse_rewrite(es):
    """Factor repeated non-trivial subexpressions into `cse_cached` nodes
    evaluated once per table (reference: expression CSE,
    `polars-plan/src/plans/optimizer/cse/cse_expr.rs`). Counting recurses
    into a subtree only on first sight, so descendants of a shared subtree
    are not separately marked."""
    counts = {}

    def count(e):
        fp = e.fingerprint()
        c = counts.get(fp, 0)
        counts[fp] = c + 1
        if c == 0:
            for ch in e.children:
                count(ch)

    for e in es:
        count(e)
    shared = {fp for fp, c in counts.items() if c > 1}
    if not shared:
        return list(es), False

    def rewrite(e):
        fp = e.fingerprint()
        if fp in shared and e.children and e.kind not in _CSE_TRIVIAL \
                and e.kind != "cse_cached":
            return Expr("cse_cached", (_rw_children(e),), fp=fp)
        return _rw_children(e)

    def _rw_children(e):
        if not e.children:
            return e
        return Expr(e.kind, tuple(rewrite(c) for c in e.children), **e.attrs)

    return [rewrite(e) for e in es], True


def column_to_val(c: Column) -> Val:
    """Column -> Val, recursively for nested layouts."""
    fields = None
    if c.fields is not None:
        fields = {fn: column_to_val(f) for fn, f in c.fields.items()}
    return Val(c.dtype, c.data, c.validity, c.sdict, False,
               lengths=c.lengths, elem_valid=c.elem_valid, fields=fields)


def val_to_column(v: Val, cap: int) -> Column:
    """Materialize a Val as a Column with row-capacity `cap`, broadcasting
    scalars and preserving nested (list/struct) layouts."""
    if v.fields is not None:
        fields = {fn: val_to_column(f, cap) for fn, f in v.fields.items()}
        validity = v.validity
        if validity is not None and validity.shape[0] != cap:
            validity = jnp.broadcast_to(validity, (cap,))
        lengths = v.lengths
        if lengths is not None and lengths.shape[0] != cap:
            lengths = jnp.broadcast_to(lengths, (cap,))
        ev = v.elem_valid
        if ev is not None and ev.shape[0] != cap:
            ev = jnp.broadcast_to(ev, (cap,) + tuple(ev.shape[1:]))
        return Column(v.dtype, None, validity, fields=fields,
                      lengths=lengths, elem_valid=ev)
    data = v.data
    if data.shape[0] != cap:
        data = jnp.broadcast_to(data, (cap,) + tuple(data.shape[1:]))
    validity = v.validity
    if validity is not None and validity.shape[0] != cap:
        validity = jnp.broadcast_to(validity, (cap,))
    lengths = v.lengths
    if lengths is not None and lengths.shape[0] != cap:
        lengths = jnp.broadcast_to(lengths, (cap,))
    ev = v.elem_valid
    if ev is not None and ev.shape[0] != cap:
        ev = jnp.broadcast_to(ev, (cap,) + tuple(ev.shape[1:]))
    return Column(v.dtype, data, validity, v.sdict, lengths=lengths,
                  elem_valid=ev)
