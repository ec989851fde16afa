"""The bit-equivalence summary must actually detect divergence.

The registered equivalence entries (sketch_checks.py) ride on
``_bit_equiv_summary``; these tests pin its sensitivity on tiny literal
frames — a value flip (float bits included), a dropped row, and a
duplicated row must each flip the booleans, and identical frames must
pass regardless of row order.
"""

from __future__ import annotations

from customer_revenue_analysis_sql_tableau_spark.operators.sketch_checks import (
    _TOPK_DIGEST,
    _bit_equiv_summary,
)

ROWS = [
    (0, 11, 0.75, 1),
    (0, 12, 0.50, 2),
    (1, 13, 0.25, 1),
]
SCHEMA = "query_id long, neighbor_id long, cosine double, rank long"


def _summary(spark, a_rows, b_rows):
    return _bit_equiv_summary(
        spark,
        spark.createDataFrame(a_rows, SCHEMA),
        spark.createDataFrame(b_rows, SCHEMA),
        "query_id",
        _TOPK_DIGEST,
        "n_queries",
    ).collect()[0]


def test_identical_frames_pass_in_any_order(spark):
    r = _summary(spark, ROWS, list(reversed(ROWS)))
    assert r["n_queries"] == 2
    assert r["rows_equal"] and r["bit_identical"]


def test_float_value_flip_detected(spark):
    mutated = [ROWS[0], (0, 12, 0.5000000001, 2), ROWS[2]]
    r = _summary(spark, ROWS, mutated)
    assert r["rows_equal"] and not r["bit_identical"]


def test_dropped_row_detected(spark):
    r = _summary(spark, ROWS, ROWS[:2])
    assert not r["rows_equal"] and not r["bit_identical"]


def test_duplicated_row_detected(spark):
    # a duplicated row self-cancels under bit_xor — the row-count
    # conjunct is what catches it; pin that it does
    r = _summary(spark, ROWS, ROWS + [ROWS[0], ROWS[0]])
    assert not r["rows_equal"] and not r["bit_identical"]
