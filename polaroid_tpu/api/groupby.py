"""GroupBy namespace (eager).

Parity target: `py-polars/src/polars/dataframe/group_by.py`.
"""

from __future__ import annotations

from typing import List

from ..expr import meta
from ..expr.expr import Expr, col as _col
from ..ops.groupby import group_by_agg


class GroupBy:
    def __init__(self, df, keys: List[Expr], maintain_order: bool = False):
        self._df = df
        self._keys = keys
        self._maintain_order = maintain_order

    def agg(self, *aggs, **named_aggs):
        from .frame import DataFrame, _to_exprs
        exprs = _to_exprs(aggs, named_aggs)
        exprs = meta.expand_exprs(exprs, self._df.schema)
        t = group_by_agg(self._df._table, self._keys, exprs,
                         self._maintain_order)
        return DataFrame._from_table(t)

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
