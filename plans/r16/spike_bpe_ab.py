"""A/B the BPE word-table checkpoint layout (r16): current HEAD form
(_bpe_checkpoint_words, SinglePartition capture) vs the r15 plain
localCheckpoint. Interleaved min-of-N on text_bpe_train and
text_bpe_train_batched; verifies merge tables identical first.

Run AFTER the code change is in (the OLD form is reproduced here by
monkeypatching _bpe_checkpoint_words back to a plain localCheckpoint).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from customer_revenue_analysis_sql_tableau_spark.session import get_spark
from customer_revenue_analysis_sql_tableau_spark.operators import text as T


def timed(fn, *a):
    t0 = time.perf_counter()
    r = fn(*a)
    return time.perf_counter() - t0, r


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("N", "4"))
    spark = get_spark("bpe-ab")

    new_ckpt = T._bpe_checkpoint_words
    old_ckpt = lambda spark, wf: wf.localCheckpoint()  # noqa: E731

    # correctness: identical merge tables under both layouts
    T._bpe_checkpoint_words = old_ckpt
    m_old = T._bpe_fit(spark, sf_dir)[0]
    mb_old = T._bpe_fit_batched(spark, sf_dir)[0]
    T._bpe_checkpoint_words = new_ckpt
    m_new = T._bpe_fit(spark, sf_dir)[0]
    mb_new = T._bpe_fit_batched(spark, sf_dir)[0]
    assert m_old == m_new, (m_old, m_new)
    assert mb_old == mb_new, (mb_old, mb_new)
    print("merge tables identical: OK")

    # plan probe: pair-count round over the new checkpoint must have no Exchange
    wf = T._bpe_checkpoint_words(spark, T._bpe_word_freqs(spark, sf_dir))
    p = T._bpe_pair_counts(wf)._jdf.queryExecution().executedPlan().toString()
    print("round-plan Exchange count (new form):", p.count("Exchange"))

    res = {"old_seq": [], "new_seq": [], "old_bat": [], "new_bat": []}
    for i in range(n):
        T._bpe_checkpoint_words = old_ckpt
        res["old_seq"].append(timed(T._bpe_fit, spark, sf_dir)[0])
        T._bpe_checkpoint_words = new_ckpt
        res["new_seq"].append(timed(T._bpe_fit, spark, sf_dir)[0])
        T._bpe_checkpoint_words = old_ckpt
        res["old_bat"].append(timed(T._bpe_fit_batched, spark, sf_dir)[0])
        T._bpe_checkpoint_words = new_ckpt
        res["new_bat"].append(timed(T._bpe_fit_batched, spark, sf_dir)[0])
    for k, v in res.items():
        print(k, "min", round(min(v), 3), [round(x, 3) for x in v])


if __name__ == "__main__":
    main()
