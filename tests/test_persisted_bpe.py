"""Persisted-BPE vocabulary lifecycle (r10 VERDICT Next #1/#7):
build-once artifacts, a training-free tokenizer read path, equality
with the in-process batched tokenizer, and strict deep-tier
compression improvement."""

from __future__ import annotations

import pytest

from customer_revenue_analysis_sql_tableau_spark.operators import text as T


@pytest.fixture(scope="module")
def built_vocabs(spark, sf_dir):
    b6 = T._ensure_bpe_vocab(spark, sf_dir, "b6")
    deep = T._ensure_bpe_vocab(spark, sf_dir, "deep")
    return b6, deep


def test_artifacts_on_disk(built_vocabs, spark):
    for d in built_vocabs:
        meta = spark.read.parquet(f"{d}/meta").collect()[0]
        merges = spark.read.parquet(f"{d}/merges")
        vocab = spark.read.parquet(f"{d}/vocab")
        assert merges.count() == meta["n_merges"] > 0
        assert vocab.count() == meta["n_word_types"] > 0
        assert 0 < meta["n_merges"] <= meta["target_merges"]
        # the merge table is the trajectory: ranks are 1..n dense
        ranks = sorted(r["rank"] for r in merges.collect())
        assert ranks == list(range(1, meta["n_merges"] + 1))


def test_build_summary_invariants(built_vocabs, spark, sf_dir):
    for tier in ("b6", "deep"):
        row = T._bpe_vocab_build_summary(spark, sf_dir, tier).collect()[0]
        assert row["vocab_covers_corpus"] is True, tier
        assert row["merges_within_target"] is True, tier
        assert row["tokstr_wellformed"] is True, tier
        assert row["n_word_types"] > 0


def test_persisted_build_table_matches_in_process(built_vocabs, spark, sf_dir):
    """The b6 tier persists the exact batched-trainer trajectory: the
    read-back merge table must equal text_bpe_train_batched row for
    row (which is itself oracle-replayed in DuckDB)."""
    got = sorted(
        map(tuple, T.text_bpe_vocab_build(spark, sf_dir).collect())
    )
    want = sorted(
        map(tuple, T.text_bpe_train_batched(spark, sf_dir).collect())
    )
    assert got == want


def test_tokenize_read_path_never_trains(built_vocabs, spark, sf_dir, monkeypatch):
    """With the vocabulary persisted, the tokenizer must be a pure
    read path: it must run even when the trainer is unreachable, its
    plan must contain no Python/Arrow eval stage, and its scans must
    come from the persisted vocab directory (mirrors
    test_persisted_ivf.py::test_read_path_never_trains)."""

    def boom(*a, **k):  # pragma: no cover - must never run
        raise AssertionError("tokenizer read path invoked BPE training")

    monkeypatch.setattr(T, "_bpe_fit_batched", boom)
    for fn in (T.text_bpe_tokenize_persisted, T.text_bpe_tokenize_deep):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "bpe_vocab_" in plan
        assert df.count() > 0


def test_persisted_tokenizer_equals_in_process(built_vocabs, spark, sf_dir):
    a = sorted(
        map(tuple, T.text_bpe_tokenize_persisted(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, T.text_bpe_tokenize_batched(spark, sf_dir).collect())
    )
    assert a == b


def test_deep_tier_merges_deeper_and_compresses_strictly(
    built_vocabs, spark, sf_dir
):
    """The deep tier must extend the shallow trajectory (strictly more
    merges up to its target/corpus ceiling) and strictly improve
    corpus-weighted compression; per word type it can never be worse
    (replaces only fuse tokens)."""
    b6, deep = built_vocabs
    m6 = spark.read.parquet(f"{b6}/meta").collect()[0]
    md = spark.read.parquet(f"{deep}/meta").collect()[0]
    assert md["n_merges"] > m6["n_merges"]
    row = T.text_bpe_deep_compression_bound(spark, sf_dir).collect()[0]
    assert row["no_word_tokenizes_worse"] is True
    assert row["total_tokens_strictly_fewer"] is True
    assert row["n_word_types_compared"] == m6["n_word_types"]


def test_deep_exhaustion_means_fully_merged(built_vocabs, spark):
    """If the deep build stopped below its merge target, the only
    legitimate cause is corpus exhaustion — every word type collapsed
    to a single token (the compression ceiling; this synthetic corpus
    has ~31 word types and exhausts near 90 merges). A starved-but-
    unfinished vocabulary would be a training-loop bug."""
    _, deep = built_vocabs
    meta = spark.read.parquet(f"{deep}/meta").collect()[0]
    if meta["n_merges"] >= meta["target_merges"]:
        pytest.skip("corpus supports the full target depth")
    vocab = spark.read.parquet(f"{deep}/vocab")
    tok_re = f"{T.BPE_S1}([^{T.BPE_S1}{T.BPE_S2}]*){T.BPE_S2}"
    multi = vocab.filter(
        f"size(regexp_extract_all(tokstr, '{tok_re}', 1)) > 1"
    ).count()
    assert multi == 0


def test_changed_corpus_changes_vocab_dir(spark, sf_dir, tmp_path):
    """The artifact dir is content-fingerprinted: a different corpus
    (different documents file) must map to a different directory, so a
    stale vocabulary can never serve a changed corpus."""
    import shutil
    from pathlib import Path

    src = Path(sf_dir) / "documents.parquet"
    alt = tmp_path / "sf_alt"
    alt.mkdir()
    if src.is_dir():
        shutil.copytree(src, alt / "documents.parquet")
    else:
        shutil.copy2(src, alt / "documents.parquet")
    # same bytes, different mtime/path → different fingerprint input;
    # bump mtime to make the difference explicit
    import os
    import time

    tgt = alt / "documents.parquet"
    walk = [tgt] if tgt.is_file() else list(tgt.rglob("*"))
    now = time.time() + 5
    for p in walk:
        os.utime(p, (now, now))
    assert T._bpe_vocab_dir(spark, str(alt), "b6") != T._bpe_vocab_dir(
        spark, sf_dir, "b6"
    )


def test_deep_first_round_coincides_with_shallow(built_vocabs, spark):
    """The deep tier runs the SAME greedy loop with a wider candidate
    window; while the top of the candidate ordering is identical and
    conflicts don't exhaust the narrow window (true in round 1 on any
    non-degenerate corpus), the two tiers must select the same round-1
    batch — the structural tie between the oracle-replayed 6-round
    trajectory and the deep table's head."""
    b6, deep = built_vocabs
    first = lambda d: sorted(  # noqa: E731
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in spark.read.parquet(f"{d}/merges")
        .filter("round = 1")
        .collect()
    )
    assert first(b6) == first(deep)


def test_deep_target_path_on_rich_corpus(spark, tmp_path):
    """This fixture corpus exhausts before the deep target, so the
    TARGET-REACHED stop never executes against testdata — exercise it
    on a synthetic corpus with enough word types: the loop must stop
    at exactly the requested merge count, within the round budget,
    and every round's selected batch must have pairwise-disjoint
    {left, right, merged} symbol sets — the invariant that makes batch
    application order-independent (r10 ADVICE)."""
    import itertools

    # ~17k distinct 6-char word types (deterministic), Zipf-ish counts
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(t)
        for t in itertools.islice(itertools.product(alphabet, repeat=3), 600)
    ]
    rows = [
        (i, " ".join(w + w[::-1] for w in words[i % 97 : i % 97 + 12]))
        for i in range(300)
    ]
    sf = tmp_path / "sf_rich"
    sf.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(sf / "documents.parquet")
    )
    target = 64
    merges, _fitted = T._bpe_fit_batched(
        spark, str(sf), rounds=16, cand_window=128, target=target
    )
    assert len(merges) == target
    by_round: dict[int, list] = {}
    for _rank, rnd, left, right, _c in merges:
        by_round.setdefault(rnd, []).append((left, right))
    assert max(by_round) <= 16
    for rnd, sel in by_round.items():
        assert len(sel) <= T.BPE_BATCH_B
        used: set[str] = set()
        for left, right in sel:
            trio = {left, right, f"{left}{right}"}
            assert not (trio & used), (rnd, sel)
            used |= trio


def test_torn_build_rebuilds_identically(spark, sf_dir, built_vocabs):
    """Meta is written LAST so its absence marks an incomplete build:
    rip meta off a finished artifact dir (what a crash mid-build
    leaves) and the next read-path call must rebuild and answer
    exactly as before — never serve the torn artifact silently."""
    import shutil

    before = sorted(
        map(tuple, T.text_bpe_tokenize_persisted(spark, sf_dir).collect())
    )
    d = T._bpe_vocab_dir(spark, sf_dir, "b6")
    shutil.rmtree(f"{d}/meta".removeprefix("file:"))
    after = sorted(
        map(tuple, T.text_bpe_tokenize_persisted(spark, sf_dir).collect())
    )
    assert after == before
    # and the rebuild completed: meta is back
    assert spark.read.parquet(f"{d}/meta").count() == 1


def test_decode_losslessness(built_vocabs, spark):
    """The trainer-artifact chain is invertible: the id assignment is
    a bijection over the bounded token set (decode is exact), and
    every fitted word's token segmentation concatenates back to the
    word itself — so ids -> tokens -> words -> text loses nothing."""
    from pyspark.sql import functions as F

    b6, _deep = built_vocabs
    tok_re = f"{T.BPE_S1}([^{T.BPE_S1}{T.BPE_S2}]*){T.BPE_S2}"
    vocab = spark.read.parquet(f"{b6}/vocab").select(
        "word",
        F.expr(f"regexp_extract_all(tokstr, '{tok_re}', 1)").alias("toks"),
    )
    rows = vocab.collect()
    assert rows
    # (a) per-word segmentation losslessness
    for r in rows:
        assert "".join(r["toks"]) == r["word"]
    # (b) dense-rank id assignment is bijective over the token set
    toks = sorted({t for r in rows for t in r["toks"]})
    ids = {t: i + 1 for i, t in enumerate(toks)}
    inverse = {v: k for k, v in ids.items()}
    assert len(inverse) == len(ids)
    assert all(inverse[ids[t]] == t for t in toks)
