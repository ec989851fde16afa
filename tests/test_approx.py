"""Sketch-tier distinct counts: error bound vs exact (§7.4.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.relational import (
    approx_distinct_customers_by_nation,
)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r["nation"]: r["approx_customers"]
        for r in approx_distinct_customers_by_nation(spark, sf_dir).collect()
    }
    t = load_tables(
        spark, sf_dir, names=("orders", "customer", "nation"), register=False
    )
    exact = {
        r["nation"]: r["n"]
        for r in t["orders"]
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            t["nation"].select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for nation, n in exact.items():
        # 2% rsd sketch: allow 6% (3 sigma) relative error
        assert abs(approx[nation] - n) <= max(3, 0.06 * n), (
            nation,
            approx[nation],
            n,
        )


def test_pca_eigenbasis_properties(spark, sf_dir):
    """PCA tier (r11): the eigenbasis from the exact Gramian must be
    orthonormal, eigenvalues sorted descending, and the distributed
    Gramian must equal numpy's computed from the same quantized
    vectors; projected component variances must follow the eigenvalue
    order."""
    import numpy as np

    from customer_revenue_analysis_sql_tableau_spark.operators import (
        embeddings as emb,
    )

    w, v, n = emb._pca_eigh(spark, sf_dir)
    assert np.all(np.diff(w) <= 1e-9)  # descending
    assert np.allclose(v.T @ v, np.eye(v.shape[1]), atol=1e-9)
    # distributed exact Gramian == numpy twin on the quantized matrix
    q = np.array(
        [r["q"] for r in emb._qvecs(spark, sf_dir).orderBy("vec_id").collect()],
        dtype=np.int64,
    )
    g_np = q.T @ q
    rows = emb.emb_gramian_exact(spark, sf_dir).collect()
    for r in rows[:200]:
        assert g_np[r["i"] - 1, r["j"] - 1] == r["gram_sum"]
    # component variances follow the eigenvalue order (top-PCA_K)
    proj = emb.emb_pca_project(spark, sf_dir).toPandas()
    variances = [
        proj[f"pc{k + 1}_micro"].to_numpy().var() for k in range(emb.PCA_K)
    ]
    assert all(
        variances[k] + 1e-6 >= variances[k + 1]
        for k in range(emb.PCA_K - 1)
    )
