"""GroupBy namespace (eager).

Parity target: `py-polars/src/polars/dataframe/group_by.py`.
"""

from __future__ import annotations

from typing import List

from ..expr import meta
from ..expr.expr import Expr, col as _col
from ..ops.groupby import group_by_agg


class GroupBy:
    def __init__(self, df, keys: List[Expr], maintain_order: bool = False,
                 having=None):
        self._df = df
        self._keys = keys
        self._maintain_order = maintain_order
        self._having = list(having) if having else []

    def agg(self, *aggs, **named_aggs):
        from .frame import DataFrame, _to_exprs
        exprs = _to_exprs(aggs, named_aggs)
        exprs = meta.expand_exprs(exprs, self._df.schema)
        hav = [h.alias(f"__pt_having_{i}")
               for i, h in enumerate(self._having)]
        t = group_by_agg(self._df._table, self._keys, exprs + hav,
                         self._maintain_order)
        out = DataFrame._from_table(t)
        if hav:
            pred = None
            for i in range(len(hav)):
                p = _col(f"__pt_having_{i}").fill_null(False)
                pred = p if pred is None else (pred & p)
            out = out.filter(pred).drop(
                *[f"__pt_having_{i}" for i in range(len(hav))])
        return out

    def having(self, *predicates) -> "GroupBy":
        """Keep only groups whose aggregate predicates hold (applied after
        agg; reference: py-polars GroupBy.having)."""
        return GroupBy(self._df, self._keys, self._maintain_order,
                       having=self._having + list(predicates))

    def head(self, n: int = 5):
        """First n rows of every group, original row order (reference:
        GroupBy.head)."""
        from ..expr.expr import lit as _lit
        keys = self._keys
        ordinal = _lit(True).cum_count().over(*keys)
        return self._df.filter(ordinal <= n)

    def tail(self, n: int = 5):
        from ..expr.expr import Expr as _E, lit as _lit
        keys = self._keys
        ordinal = _lit(True).cum_count().over(*keys)
        glen = _E("table_len").over(*keys)
        return self._df.filter(ordinal > glen - n)

    def all(self):
        """Implode every non-key column per group."""
        return self.agg([_col(n).implode().alias(n)
                         for n in self._all_non_key()])

    def __iter__(self):
        """Iterate (key, sub-frame) pairs (reference:
        `py-polars` GroupBy.__iter__). Keys follow first-occurrence order
        when maintain_order else sorted partition order."""
        parts = self._df.partition_by(
            [meta.output_name(k) for k in self._keys], as_dict=True,
            maintain_order=True)
        for k, sub in parts.items():
            yield k, sub

    def map_groups(self, function):
        """Apply a DataFrame -> DataFrame function per group and vstack
        the results (reference: GroupBy.map_groups / apply)."""
        from .functions import concat
        outs = [function(sub) for _, sub in self]
        if not outs:
            from .frame import DataFrame
            return DataFrame()
        return concat(outs, how="vertical_relaxed")

    apply = map_groups

    def _all_non_key(self):
        key_names = {meta.output_name(k) for k in self._keys}
        return [n for n in self._df.columns if n not in key_names]

    def len(self, name: str = "len"):
        return self.agg(Expr("table_len").alias(name))

    def count(self):
        return self.len(name="count")

    def sum(self):
        return self.agg([_col(n).sum().alias(n) for n in self._all_non_key()])

    def mean(self):
        return self.agg([_col(n).mean().alias(n) for n in self._all_non_key()])

    def min(self):
        return self.agg([_col(n).min().alias(n) for n in self._all_non_key()])

    def max(self):
        return self.agg([_col(n).max().alias(n) for n in self._all_non_key()])

    def first(self):
        return self.agg([_col(n).first().alias(n) for n in self._all_non_key()])

    def last(self):
        return self.agg([_col(n).last().alias(n) for n in self._all_non_key()])

    def median(self):
        return self.agg([_col(n).median().alias(n) for n in self._all_non_key()])

    def n_unique(self):
        return self.agg([_col(n).n_unique().alias(n) for n in self._all_non_key()])

    def quantile(self, q: float, interpolation: str = "nearest"):
        return self.agg([_col(n).quantile(q, interpolation).alias(n)
                         for n in self._all_non_key()])
