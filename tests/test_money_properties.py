"""Hypothesis property tests for the money arithmetic the whole parity
surface rests on (functions/money.py): the integer-exact division-round
must agree with Python Decimal HALF_UP for any money-shaped input."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.functions.money import round2_div


@pytest.fixture(scope="module")
def div_fn(spark):
    """Compile the round2_div plan once; evaluate batches through it."""

    def run(pairs: list[tuple[Decimal, int]]) -> list[float]:
        df = spark.createDataFrame(
            [(n, d) for n, d in pairs], "n decimal(18,4), d long"
        )
        out = df.select(round2_div(F.col("n"), F.col("d")).alias("r")).collect()
        return [r["r"] for r in out]

    return run


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            # scale-4 money sums up to ~1e9 (beyond any per-group sum here)
            st.decimals(
                min_value=Decimal("0.0000"),
                max_value=Decimal("999999999.9999"),
                places=4,
            ),
            st.integers(min_value=1, max_value=10_000_000),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_round2_div_matches_decimal_half_up(div_fn, pairs):
    got = div_fn(pairs)
    for (n, d), g in zip(pairs, got):
        want = float(
            (Decimal(n) / Decimal(d)).quantize(Decimal("0.01"), ROUND_HALF_UP)
        )
        assert g == pytest.approx(want, abs=0), f"{n}/{d}: spark={g} decimal={want}"


def test_round2_div_half_up_boundaries(div_fn):
    """The exact .xx5 midpoints where double-rounding engines disagree."""
    pairs = [
        (Decimal("3.7050"), 1),  # 3.705 → 3.71 (HALF_UP), not 3.70
        (Decimal("0.0050"), 1),
        (Decimal("118.6800"), 32),  # MARY SMITH: 3.70875 → 3.71
        (Decimal("2.5000"), 1000),  # 0.0025 → 0.00? HALF_UP cents: 0.0025→0.00
    ]
    got = div_fn(pairs)
    want = [
        float((Decimal(n) / Decimal(d)).quantize(Decimal("0.01"), ROUND_HALF_UP))
        for n, d in pairs
    ]
    assert got == want
