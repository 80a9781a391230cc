from .expr import Expr, col, lit, when, len_ as len, all_ as all, nth, first, last  # noqa
