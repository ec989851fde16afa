"""Portable scalar-function layer (SURVEY.md §2.8).

Every scalar function the reference calls (CONCAT, DATEDIFF, DATE_SUB,
DATE_FORMAT, ROUND, COALESCE, IF/CASE, ...) has a Spark builtin; this
package adds the *portability* layer that makes money math hash-identical
between Spark and the DuckDB oracle (SURVEY.md §7.4 hazard 2):

- money goes through DECIMAL end-to-end (exact, order-independent sums);
- division-derived metrics round via exact integer arithmetic, because
  ``ROUND(double, 2)`` ties break differently across engines.
"""

from .money import (
    MONEY_SCALE,
    money,
    round2_div,
    round2_div_sql,
    sum_money_as_double,
)

__all__ = [
    "MONEY_SCALE",
    "money",
    "round2_div",
    "round2_div_sql",
    "sum_money_as_double",
]
