"""BM25 ranked full-text retrieval: relevance + determinism contract.

Cross-checks the Spark operator against an independent pure-Python
BM25 over the same corpus (tokenization, idf formula, parameter
values), and pins the retrieval invariants: descending score order,
deterministic tie-break, no zero-match documents.
"""

from __future__ import annotations

import math

from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
from customer_revenue_analysis_sql_tableau_spark.operators.text import (
    BM25_B,
    BM25_K1,
    RANKED_QUERY,
    text_ranked_search,
)


def _python_bm25(docs: list[tuple[int, str]], terms: tuple[str, ...]):
    toks = {doc_id: text.strip().lower().split() for doc_id, text in docs}
    n = float(len(docs))
    avgdl = float(sum(len(t) for t in toks.values())) / n
    df = {
        t: float(sum(1 for tk in toks.values() if t in tk)) for t in terms
    }
    idf = {
        t: math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0) for t in terms
    }
    scores: dict[int, float] = {}
    matched: dict[int, int] = {}
    for doc_id, tk in toks.items():
        dl = float(len(tk))
        s = 0.0
        m = 0
        for t in terms:
            tf = float(tk.count(t))
            if tf > 0:
                m += 1
                s += (
                    idf[t]
                    * (tf * (BM25_K1 + 1.0))
                    / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl)))
                )
        if s > 0:
            scores[doc_id] = s
            matched[doc_id] = m
    return scores, matched


def test_bm25_matches_independent_python_model(spark, sf_dir):
    d = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ]
    docs = [(r.doc_id, r.text) for r in d.select("doc_id", "text").collect()]
    py_scores, py_matched = _python_bm25(docs, RANKED_QUERY)
    k = 20
    expected = sorted(py_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    got = text_ranked_search(spark, sf_dir, k=k).collect()
    assert len(got) == k
    for row, (doc_id, score) in zip(got, expected):
        assert row.doc_id == doc_id
        assert abs(row.score - score) < 1e-8, (row.doc_id, row.score, score)
        assert row.n_terms_matched == py_matched[doc_id]


def test_bm25_retrieval_invariants(spark, sf_dir):
    rows = text_ranked_search(spark, sf_dir, k=50).collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.score > 0 and r.n_terms_matched >= 1 for r in rows)
    # tie-break is doc_id ascending within equal scores
    for a, b in zip(rows, rows[1:]):
        if a.score == b.score:
            assert a.doc_id < b.doc_id


def test_bpe_pattern_splits_like_a_bpe_pretokenizer(spark, sf_dir):
    """The BPE-ish pattern must split contractions, keep the space
    prefix with the following word, and isolate digit/punct runs."""
    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.operators.text import (
        BPE_PATTERN,
        text_token_stats_bpe,
    )

    df = spark.createDataFrame(
        [("it's 2024, don't panic!",)], "text string"
    ).select(
        F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)).alias("t")
    )
    assert df.first()["t"] == [
        "it", "'s", " 2024", ",", " don", "'t", " panic", "!",
    ]
    # and every document tokenizes to at least its whitespace count
    bad = (
        text_token_stats_bpe(spark, sf_dir)
        .filter(F.col("n_bpe_tokens") < F.col("n_ws_tokens"))
        .count()
    )
    assert bad == 0


def test_rolling_hash_is_incrementally_updatable(spark, sf_dir):
    """The defining property of the rolling form: appending one char is
    a single multiply-add on the previous hash."""
    from customer_revenue_analysis_sql_tableau_spark.operators.text import (
        ROLL_B,
        ROLL_M,
        text_rolling_fingerprint,
        _roll_expr,
    )

    h1_expr = _roll_expr("'spark'")
    h2_expr = _roll_expr("'sparks'")
    row = spark.sql(f"SELECT {h1_expr} AS h1, {h2_expr} AS h2").first()
    assert row.h2 == (row.h1 * ROLL_B + ord("s")) % ROLL_M

    # hashes over the corpus are deterministic and collision-free enough
    # to be a fingerprint: distinct texts map to distinct hashes here
    fp = text_rolling_fingerprint(spark, sf_dir)
    n_docs = fp.count()
    n_hashes = fp.select("rolling_hash").distinct().count()
    from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
    d = load_tables(spark, sf_dir, names=("documents",), register=False)["documents"]
    n_texts = d.selectExpr("trim(lower(text)) AS t").distinct().count()
    assert n_hashes == n_texts and n_docs >= n_texts


def test_phrase_search_counts_consecutive_occurrences(spark, sf_dir):
    """Phrase mode must require adjacency (not just co-occurrence) and
    count overlapping occurrences positionally."""
    from pyspark.sql import functions as F

    from customer_revenue_analysis_sql_tableau_spark.catalog import load_tables
    from customer_revenue_analysis_sql_tableau_spark.operators.text import (
        PHRASE,
        text_phrase_search,
    )

    got = {r.doc_id: r.n_occurrences for r in text_phrase_search(spark, sf_dir).collect()}
    docs = load_tables(spark, sf_dir, names=("documents",), register=False)[
        "documents"
    ].select("doc_id", "text").collect()
    for r in docs:
        toks = r.text.strip().lower().split()
        n = sum(
            1
            for i in range(len(toks) - len(PHRASE) + 1)
            if tuple(toks[i : i + len(PHRASE)]) == PHRASE
        )
        if n:
            assert got.get(r.doc_id) == n, r.doc_id
        else:
            assert r.doc_id not in got


def test_search_terms_with_quotes_are_data_not_sql(spark, sf_dir):
    """A runtime term containing a quote (or other expression text) must
    be treated as data: no parse error, no injection, just zero hits on
    this corpus. Locks the Column-API/escaping fix for phrase, ranked,
    and fulltext search."""
    from customer_revenue_analysis_sql_tableau_spark.operators.text import (
        _bm25_oracle,
        _phrase_oracle,
        fulltext_search,
        text_phrase_search,
        text_ranked_search,
    )

    hostile = "o'reilly) OR (1=1"
    assert text_phrase_search(spark, sf_dir, phrase=(hostile, "x")).count() == 0
    assert fulltext_search(spark, sf_dir, needle=hostile).count() == 0
    # ranked search scores every doc 0 for an absent term → empty top-k
    # after the score>0 pre-filter, but must not throw
    assert text_ranked_search(spark, sf_dir, terms=(hostile,), k=5).count() == 0

    # the oracle builders must emit parseable, equivalent SQL
    import duckdb
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from oracle_check import duckdb_connection

    con = duckdb_connection(sf_dir)
    try:
        assert con.execute(_phrase_oracle((hostile, "x"))).fetchall() == []
        assert con.execute(_bm25_oracle((hostile,), 5)).fetchall() == []
    finally:
        con.close()
