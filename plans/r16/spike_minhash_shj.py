"""A/B: dedup_minhash_lsh band self-join as ShuffledHashJoin (both
sides exchange on (band,bucket) over canonically-equal subtrees -> AQE
reuses ONE banded build) vs the current optimizer-chosen broadcast
(which rebuilds the final signature agg + band explode inside the
broadcast, and ships a corpus-sized relation at scale).

Also A/Bs pinning shuffle_hash on the verify joins (candidates x
shingles) where the optimizer currently BROADCASTS the corpus-sized
shingle frame.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.session import get_spark
from customer_revenue_analysis_sql_tableau_spark.operators import dedup as D


def lsh_variant(spark, sf_dir, band_shj=False, verify_shj=False):
    sh, banded = D._banded_signatures(spark, sf_dir)
    a = banded.alias("a")
    b = (banded.hint("shuffle_hash") if band_shj else banded).alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    if not verify_shj:
        return D._jaccard_pairs_from_candidates(sh, candidates, D.JACCARD_T)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = sh.hint("shuffle_hash").alias("s1")
    s2 = sh.hint("shuffle_hash").alias("s2")
    inter = (
        candidates.join(s1, F.col("d1") == F.col("s1.doc_id"))
        .join(
            s2,
            (F.col("d2") == F.col("s2.doc_id"))
            & (F.col("s1.shingle") == F.col("s2.shingle")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    z1 = sizes.alias("z1")
    z2 = sizes.alias("z2")
    return (
        inter.join(z1, F.col("d1") == F.col("z1.doc_id"))
        .join(z2, F.col("d2") == F.col("z2.doc_id"))
        .select(
            "d1",
            "d2",
            (
                F.col("inter")
                / (F.col("z1.n") + F.col("z2.n") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= D.JACCARD_T)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("N", "4"))
    spark = get_spark("minhash-shj-ab")

    base = {tuple(sorted((r.d1, r.d2))) for r in D.dedup_minhash_lsh(spark, sf_dir).collect()}
    for bs, vs in ((True, False), (False, True), (True, True)):
        got = {tuple(sorted((r.d1, r.d2))) for r in lsh_variant(spark, sf_dir, bs, vs).collect()}
        assert got == base, (bs, vs, len(got), len(base))
    print(f"pair sets identical across variants: OK ({len(base)} pairs)")

    def timed(fn):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {
        "cur": lambda: D.dedup_minhash_lsh(spark, sf_dir),
        "band_shj": lambda: lsh_variant(spark, sf_dir, band_shj=True),
        "verify_shj": lambda: lsh_variant(spark, sf_dir, verify_shj=True),
        "both_shj": lambda: lsh_variant(spark, sf_dir, band_shj=True, verify_shj=True),
    }
    for k, fn in variants.items():
        timed(fn)  # warm codegen
    res = {k: [] for k in variants}
    for i in range(n):
        for k, fn in variants.items():
            res[k].append(timed(fn))
    for k, v in res.items():
        print(k, "min", round(min(v), 3), [round(x, 3) for x in v])

    # executed-plan census of the winner candidates
    df = lsh_variant(spark, sf_dir, band_shj=True)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    print("band_shj executed:", {
        "Exchange": p.count("Exchange hash"),
        "ReusedExchange": p.count("ReusedExchange"),
        "BroadcastExchange": p.count("BroadcastExchange"),
        "ShuffledHashJoin": p.count("ShuffledHashJoin"),
        "sig_final_aggs": p.count("functions=[min(xxhash64"),
    })


if __name__ == "__main__":
    main()
