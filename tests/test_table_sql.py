"""SQL statement front-end (r15): the bounded MERGE/DELETE/OPTIMIZE/
RESTORE/DESCRIBE HISTORY/VERSION AS OF dialect over ManifestTable —
every statement dispatches onto the facade, out-of-dialect statements
are rejected loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.sources import manifest_table as mt
from customer_revenue_analysis_sql_tableau_spark.sources.parquet import MONTH_COL
from customer_revenue_analysis_sql_tableau_spark.sources.table_api import ManifestTable
from customer_revenue_analysis_sql_tableau_spark.sources.table_sql import (
    ManifestSqlError,
    _split_month_disjunct,
    execute_table_sql,
)


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") * 3.0).alias("v"),
        F.to_timestamp(
            F.concat(
                F.lit("2001-0"),
                (F.col("id") % 3 + 1).cast("string"),
                F.lit("-15"),
            )
        ).alias("ts"),
    )
    return ManifestTable.create(
        spark, df, str(tmp_path / "sqltbl"), date_col="ts"
    )


def test_sql_lifecycle_matches_facade_semantics(spark, table):
    t = table
    tables = {"tbl": t}
    # MERGE: update k%10==0 (v+1000), insert k+5000 twins
    hit = t.read(1).filter(F.col("k") % 10 == 0)
    src = hit.withColumn("v", F.col("v") + 1000.0).unionByName(
        hit.withColumn("k", F.col("k") + 5000)
    )
    src.createOrReplaceTempView("merge_src")
    execute_table_sql(
        spark,
        "MERGE INTO tbl USING merge_src ON tbl.k = merge_src.k"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *",
        tables=tables,
    )
    assert t.version() == 2
    assert t.read().count() == 330
    assert t.read().filter(
        (F.col("k") % 10 == 0) & (F.col("k") < 5000) & (F.col("v") < 1000)
    ).count() == 0
    # DELETE: month drop (metadata) + predicate CoW in one commit
    execute_table_sql(
        spark,
        f"DELETE FROM tbl WHERE {MONTH_COL} = '2001-01' OR k % 7 = 3",
        tables=tables,
    )
    assert t.version() == 3
    out = t.read()
    assert out.filter(F.col(MONTH_COL) == "2001-01").count() == 0
    assert out.filter(F.col("k") % 7 == 3).count() == 0
    n3 = out.count()
    # OPTIMIZE one month (no ZORDER): content-neutral
    execute_table_sql(
        spark,
        f"OPTIMIZE tbl WHERE {MONTH_COL} IN ('2001-02')",
        tables=tables,
    )
    assert t.version() == 4 and t.read().count() == n3
    # RESTORE to the post-merge state
    execute_table_sql(
        spark, "RESTORE TABLE tbl TO VERSION AS OF 2", tables=tables
    )
    assert t.version() == 5 and t.read().count() == 330
    # DESCRIBE HISTORY sees the five operations in order
    hist = execute_table_sql(spark, "DESCRIBE HISTORY tbl", tables=tables)
    ops = [r["operation"] for r in hist.orderBy("version").collect()]
    assert ops == ["CREATE", "UPSERT", "DELETE", "OPTIMIZE", "RESTORE"]
    # time travel through SELECT
    n_v3 = execute_table_sql(
        spark,
        "SELECT count(*) AS n FROM tbl VERSION AS OF 3",
        tables=tables,
    ).collect()[0]["n"]
    assert n_v3 == n3
    # mixed: pinned and head reads in ONE statement
    both = execute_table_sql(
        spark,
        "SELECT (SELECT count(*) FROM tbl) -"
        " (SELECT count(*) FROM tbl VERSION AS OF 3) AS delta",
        tables=tables,
    ).collect()[0]["delta"]
    assert both == 330 - n3


def test_sql_optimize_zorder_dispatch(spark, table):
    t = table
    execute_table_sql(
        spark,
        f"OPTIMIZE tbl WHERE {MONTH_COL} = '2001-01' ZORDER BY (k, v)",
        tables={"tbl": t},
    )
    chain = mt.manifest_chain(t.root)
    assert chain[2]["operation"] == "OPTIMIZE_ZORDER"
    assert t.read().count() == 300


def test_month_disjunct_decomposition():
    months, rest = _split_month_disjunct(f"{MONTH_COL} = '1996-01'")
    assert months == ["1996-01"] and rest is None
    months, rest = _split_month_disjunct(
        f"{MONTH_COL} IN ('1996-01', '1996-02')"
    )
    assert months == ["1996-01", "1996-02"] and rest is None
    months, rest = _split_month_disjunct(
        f"{MONTH_COL} = '1996-01' OR o_custkey % 13 = 6"
    )
    assert months == ["1996-01"] and rest == "o_custkey % 13 = 6"
    months, rest = _split_month_disjunct("o_custkey % 13 = 6")
    assert months == [] and rest == "o_custkey % 13 = 6"


@pytest.mark.parametrize(
    "stmt",
    [
        "UPDATE tbl SET v = 1",  # UPDATE requires WHERE
        "UPDATE tbl WHERE k = 1",  # UPDATE requires SET
        "INSERT INTO tbl VALUES (1, 2.0)",  # no VALUES form
        "DELETE FROM tbl",  # DELETE needs WHERE
        "MERGE INTO tbl USING s ON tbl.k = s.k WHEN MATCHED THEN DELETE",
        "MERGE INTO tbl USING s ON tbl.k > s.k"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *",  # non-equality ON
        "MERGE INTO tbl USING s ON tbl.k = s.other"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *",  # key name mismatch
        "MERGE INTO tbl USING s ON x.k = y.k"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *",  # aliases not the operands
        "OPTIMIZE tbl WHERE k > 5",  # not a partition selector
        "TRUNCATE TABLE tbl",
        "DROP TABLE tbl",
        "CREATE TABLE other AS SELECT 1",
    ],
)
def test_out_of_dialect_statements_raise(spark, table, stmt):
    with pytest.raises(ManifestSqlError):
        execute_table_sql(spark, stmt, tables={"tbl": table})


def test_unknown_table_raises(spark, table):
    with pytest.raises(ManifestSqlError, match="unknown"):
        execute_table_sql(
            spark, "DESCRIBE HISTORY nope", tables={"tbl": table}
        )


def test_merge_source_must_exist(spark, table):
    with pytest.raises(ManifestSqlError, match="source"):
        execute_table_sql(
            spark,
            "MERGE INTO tbl USING no_such_view ON tbl.k = no_such_view.k"
            " WHEN MATCHED THEN UPDATE SET *"
            " WHEN NOT MATCHED THEN INSERT *",
            tables={"tbl": table},
        )


def test_sql_update_where_semantics(spark, tmp_path):
    """UPDATE: multi-assignment SET (comma inside concat survives the
    paren-aware splitter), rows updated only where the predicate is
    TRUE — NULL-predicate rows untouched (three-valued semantics) —
    and the partition column is not assignable."""
    df = spark.range(300).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, F.lit(None))
        .otherwise(F.col("id") * 3)
        .cast("double")
        .alias("v"),
        F.lit("x").alias("tag"),
        F.to_timestamp(
            F.concat(
                F.lit("2001-0"),
                (F.col("id") % 3 + 1).cast("string"),
                F.lit("-15"),
            )
        ).alias("ts"),
    )
    t = ManifestTable.create(spark, df, str(tmp_path / "updtbl"), date_col="ts")
    tables = {"tbl": t}
    n_null = df.filter(F.col("v").isNull()).count()
    execute_table_sql(
        spark,
        "UPDATE tbl SET v = v + 1000, tag = concat(tag, '!', 'y')"
        " WHERE v > 100",
        tables=tables,
    )
    out = t.read()
    assert out.count() == 300  # UPDATE never changes cardinality
    assert out.filter(F.col("v").isNull()).count() == n_null
    hit = out.filter(F.col("v") > 1000)
    assert hit.count() == df.filter(F.col("v") > 100).count()
    assert hit.filter(F.col("tag") != "x!y").count() == 0
    assert out.filter((F.col("v") <= 100) & (F.col("tag") != "x")).count() == 0
    with pytest.raises(ValueError, match="partition column"):
        t.update({MONTH_COL: F.lit("1999-01")}, F.col("k") == 1)


def test_sql_insert_into_table_and_select(spark, table):
    """INSERT INTO: both the TABLE <view> form and a SELECT with a
    nested VERSION AS OF read; the commit is append-only (files of the
    pre-insert head all survive)."""
    t = table
    tables = {"tbl": t}
    head_files = {
        (m, n)
        for m, ns in mt.resolve_manifest(t.root)["files"].items()
        for n in ns
    }
    twins = t.read().filter(F.col("k") % 50 == 0).withColumn(
        "k", F.col("k") + 9000
    )
    twins.createOrReplaceTempView("ins_src")
    execute_table_sql(spark, "INSERT INTO tbl TABLE ins_src", tables=tables)
    n1 = t.read().count()
    assert n1 == 300 + twins.count()
    execute_table_sql(
        spark,
        "INSERT INTO tbl SELECT k + 90000 AS k, v, ts, part_month"
        " FROM tbl VERSION AS OF 1 WHERE k % 100 = 7",
        tables=tables,
    )
    assert t.read().count() == n1 + 3
    after = {
        (m, n)
        for m, ns in mt.resolve_manifest(t.root)["files"].items()
        for n in ns
    }
    assert head_files <= after  # pure append: nothing removed
    ops = {
        r["version"]: r["operation"]
        for r in t.history().collect()
    }
    assert ops[2] == "INSERT" and ops[3] == "INSERT"


def test_sql_table_changes_tvf(spark, table):
    """table_changes(t, a, b[, key]) rewrites to the facade's change
    feed: a MERGE commit's pre/post pairs select through plain SQL,
    carried neighbors absent; unknown table names are left untouched
    and fail resolution loudly."""
    t = table
    tables = {"tbl": t}
    hit = t.read(1).filter(F.col("k") % 10 == 0)
    src = hit.withColumn("v", F.col("v") + 1000.0).unionByName(
        hit.withColumn("k", F.col("k") + 5000)
    )
    src.createOrReplaceTempView("tvf_merge_src")
    execute_table_sql(
        spark,
        "MERGE INTO tbl USING tvf_merge_src ON tbl.k = tvf_merge_src.k"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *",
        tables=tables,
    )
    ch = execute_table_sql(
        spark,
        "SELECT k, v, _change_type, _commit_version"
        " FROM table_changes(tbl, 1, 2, 'k')"
        " ORDER BY _change_type, k",
        tables=tables,
    )
    rows = ch.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r)
    n_hit = hit.count()
    assert len(by_type["insert"]) == n_hit  # the +5000 twins
    assert len(by_type["update_preimage"]) == n_hit
    assert len(by_type["update_postimage"]) == n_hit
    assert all(r["_commit_version"] == 2 for r in rows)
    assert all(r["k"] >= 5000 for r in by_type["insert"])
    pre_v = {r["k"]: r["v"] for r in by_type["update_preimage"]}
    post_v = {r["k"]: r["v"] for r in by_type["update_postimage"]}
    assert all(post_v[k] == pre_v[k] + 1000.0 for k in pre_v)


def test_check_constraints_enforced_across_verbs(spark, table):
    """CHECK constraints: metadata-only ADD commit, carried through
    later mutations, enforced on INSERT/UPDATE/MERGE (violation =
    expression FALSE; NULL passes), droppable, un-addable when
    existing rows violate."""
    from customer_revenue_analysis_sql_tableau_spark.sources.table_api import (
        ConstraintViolationError,
    )

    t = table
    tables = {"tbl": t}
    execute_table_sql(
        spark,
        "ALTER TABLE tbl ADD CONSTRAINT v_nonneg CHECK (v >= 0)",
        tables=tables,
    )
    assert t.constraints() == {"v_nonneg": "v >= 0"}
    # un-addable: existing rows violate
    with pytest.raises(ConstraintViolationError):
        execute_table_sql(
            spark,
            "ALTER TABLE tbl ADD CONSTRAINT impossible CHECK (v > 10000)",
            tables=tables,
        )
    # duplicate name is loud
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("v_nonneg", "v >= 0")
    # violating INSERT rejected, nothing committed
    head = t.version()
    bad = t.read().limit(5).withColumn("v", F.lit(-3.0)).withColumn(
        "k", F.col("k") + 7000
    )
    bad.createOrReplaceTempView("bad_src")
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        execute_table_sql(
            spark, "INSERT INTO tbl TABLE bad_src", tables=tables
        )
    assert t.version() == head
    # violating UPDATE post-image rejected
    with pytest.raises(ConstraintViolationError):
        execute_table_sql(
            spark,
            "UPDATE tbl SET v = v - 100000 WHERE k < 10",
            tables=tables,
        )
    # violating MERGE source rejected
    with pytest.raises(ConstraintViolationError):
        t.upsert(bad, key="k")
    assert t.version() == head
    # NULL passes (three-valued CHECK): a null-v insert lands
    nulls = t.read().limit(3).withColumn(
        "v", F.lit(None).cast("double")
    ).withColumn("k", F.col("k") + 8000)
    t.insert_into(nulls)
    assert t.version() == head + 1
    # the constraint CARRIED through that mutation, still enforced
    with pytest.raises(ConstraintViolationError):
        t.insert_into(bad)
    # history records the metadata commit
    ops = {r["version"]: r["operation"] for r in t.history().collect()}
    assert ops[2] == "ADD_CONSTRAINT"
    # drop, then the violating insert succeeds
    execute_table_sql(
        spark, "ALTER TABLE tbl DROP CONSTRAINT v_nonneg", tables=tables
    )
    assert t.constraints() == {}
    t.insert_into(bad)
    assert t.read().filter(F.col("v") < 0).count() == 5


def test_sql_ctas_and_replace(spark, table, tmp_path):
    """CREATE TABLE AS SELECT builds a new manifested table from a
    statement (the SELECT derives part_month); bare CREATE over an
    existing table refuses; CREATE OR REPLACE swaps every file in one
    commit while v1 stays time-travelable; a frame without part_month
    is rejected."""
    t = table
    root2 = str(tmp_path / "clone")
    tables = {"tbl": t, "t2": root2}
    execute_table_sql(
        spark,
        "CREATE TABLE t2 AS SELECT k, v, part_month FROM tbl"
        " WHERE k % 2 = 0",
        tables=tables,
    )
    t2 = ManifestTable(spark, root2)
    assert t2.read().count() == 150
    assert mt.resolve_manifest(root2, 1)["operation"] == "CREATE"
    with pytest.raises(ManifestSqlError, match="already exists"):
        execute_table_sql(
            spark,
            "CREATE TABLE t2 AS SELECT k, v, part_month FROM tbl",
            tables=tables,
        )
    execute_table_sql(
        spark,
        "CREATE OR REPLACE TABLE t2 AS"
        " SELECT k, v + 10000 AS v, part_month FROM tbl WHERE k % 3 = 0",
        tables=tables,
    )
    assert t2.version() == 2
    assert t2.read().count() == 100
    assert t2.read().filter(F.col("v") < 10000).count() == 0
    # the replace is time-travelable: v1 content intact
    assert t2.read(1).count() == 150
    hist = {r["version"]: r["operation"] for r in t2.history().collect()}
    assert hist == {1: "CREATE", 2: "REPLACE"}
    # a CTAS frame without the partition column is loud
    with pytest.raises(ValueError, match=MONTH_COL):
        ManifestTable.create_from(
            spark, t.read().select("k", "v"), str(tmp_path / "bad")
        )
