"""Second minhash band-join A/B: bench-action (count) timing, high N,
alternating order within each pair to cancel monotonic drift."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F

from customer_revenue_analysis_sql_tableau_spark.session import get_spark
from customer_revenue_analysis_sql_tableau_spark.operators import dedup as D


def lsh(spark, sf_dir, shj: bool):
    sh, banded = D._banded_signatures(spark, sf_dir)
    a = banded.alias("a")
    b = (banded.hint("shuffle_hash") if shj else banded).alias("b")
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
    return D._jaccard_pairs_from_candidates(sh, candidates, D.JACCARD_T)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("N", "8"))
    spark = get_spark("minhash-count-ab")

    def timed(shj):
        t0 = time.perf_counter()
        lsh(spark, sf_dir, shj).count()
        return time.perf_counter() - t0

    timed(False); timed(True)  # warm
    old, new = [], []
    wins = 0
    for i in range(n):
        if i % 2 == 0:
            o = timed(False); nw = timed(True)
        else:
            nw = timed(True); o = timed(False)
        old.append(o); new.append(nw)
        wins += nw < o
    print("old(bcast) min", round(min(old), 3), [round(x, 3) for x in old])
    print("new(shj)   min", round(min(new), 3), [round(x, 3) for x in new])
    print(f"new wins {wins}/{n} pairs")


if __name__ == "__main__":
    main()
