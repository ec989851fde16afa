"""CBO statistics pass (VERDICT r8, Next #6).

SCALE.md listed "no ANALYZE stats / no CBO run" as a known limit: the
view's join order and broadcast choices were asserted by hand-written
plan tests, not optimizer-chosen. This test closes that gap: it
persists the sf0.1 tables to the warehouse catalog, runs ``ANALYZE
TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS``, enables
``spark.sql.cbo.enabled`` + ``joinReorder``, and plans the UNHINTED
declarative 8-table view SQL (the reference's own join order,
``queries_shan.sql:7-42``) against the analyzed catalog. Assertions:

- every table carries row-count statistics (the ANALYZE landed);
- the optimizer propagates a cardinality estimate to the TOP of the
  plan (cost-based estimation is actually running, not just stored);
- the cost-based join reorder RETAINS the FK-chain order the
  production view hand-freezes — the join order is now
  optimizer-chosen, not only hint-frozen (measured: CBO keeps
  region→nation→customer→orders→lineitem→part; no BENCH change);
- build sides come from size statistics: every join broadcasts the
  provably-smaller side, and nothing degenerates to a nested-loop or
  cartesian plan.
"""

from __future__ import annotations

import re

import pytest

SF_CBO = "/root/testdata/sf0.1"

_CBO_CONFS = (
    "spark.sql.cbo.enabled",
    "spark.sql.cbo.joinReorder.enabled",
)


@pytest.fixture()
def cbo_spark(spark):
    old = {k: spark.conf.get(k) for k in _CBO_CONFS}
    for k in _CBO_CONFS:
        spark.conf.set(k, "true")
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def test_cbo_statistics_drive_the_view_join_plan(cbo_spark):
    from customer_revenue_analysis_sql_tableau_spark.operators.warehouse import (
        prepare_analyzed_catalog,
    )

    spark = cbo_spark
    names = prepare_analyzed_catalog(spark, SF_CBO)

    # the ANALYZE landed: every table has a row-count statistic
    for table, cat in names.items():
        ext = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {cat}").collect()
        }
        assert "Statistics" in ext and "rows" in ext["Statistics"], table

    q = spark.sql(
        f"""
        SELECT c.c_custkey, count(*) AS n, sum(l.l_extendedprice) AS rev
        FROM {names['region']} r
        JOIN {names['nation']} n ON n.n_regionkey = r.r_regionkey
        JOIN {names['customer']} c ON c.c_nationkey = n.n_nationkey
        JOIN {names['orders']} o ON o.o_custkey = c.c_custkey
        JOIN {names['lineitem']} l ON l.l_orderkey = o.o_orderkey
        JOIN {names['part']} p ON p.p_partkey = l.l_partkey
        GROUP BY 1
        """
    )
    qe = q._jdf.queryExecution()

    # cost-based estimation propagates to the top of the plan
    assert qe.optimizedPlan().stats().rowCount().isDefined()

    # the cost-based reorder keeps the FK-chain order the production
    # view freezes — optimizer-confirmed, not only hint-frozen
    opt = qe.optimizedPlan().toString()
    order = []
    for m in re.finditer(r"`?(\w+)_stats_\w+`?", opt):
        if m.group(1) not in order:
            order.append(m.group(1))
    assert order == [
        "region",
        "nation",
        "customer",
        "orders",
        "lineitem",
        "part",
    ], order

    # size statistics pick every build side; no degenerate strategies
    phys = qe.executedPlan().toString()
    assert phys.count("BroadcastHashJoin") == 5, phys.count("BroadcastHashJoin")
    assert "BroadcastNestedLoopJoin" not in phys
    assert "CartesianProduct" not in phys


def test_cbo_estimates_shrink_with_a_selective_filter(cbo_spark):
    """The point of column-level stats: a selective predicate must cut
    the optimizer's cardinality estimate, which is what lets it move a
    filtered fact to the build side at 100 TB. Compare the top-level
    row-count estimate with and without a tight l_quantity filter."""
    from customer_revenue_analysis_sql_tableau_spark.operators.warehouse import (
        prepare_analyzed_catalog,
    )

    spark = cbo_spark
    names = prepare_analyzed_catalog(spark, SF_CBO)
    base = spark.sql(f"SELECT * FROM {names['lineitem']}")
    narrow = spark.sql(
        f"SELECT * FROM {names['lineitem']} WHERE l_quantity < 2"
    )

    def est(df) -> int:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        assert rc.isDefined()
        return int(str(rc.get()))

    assert est(narrow) < est(base) * 0.25
