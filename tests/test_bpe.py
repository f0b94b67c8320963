"""Deterministic BPE (functions/bpe.py): trainer tie-breaks, greedy
left-to-right application, and the per-type Spark counting path."""

from __future__ import annotations

from block_explorer_spark.functions import bpe as B


def test_train_merges_deterministic_and_ordered():
    counts = [("abab", 10), ("abc", 5), ("zz", 1)]
    merges = B.train_merges(counts, 10)
    # (a,b) occurs 25 times (2 per 'abab' x10 + 1 per 'abc' x5) — first.
    assert merges[0] == ("a", "b")
    # after merging: abab->[ab,ab], abc->[ab,c]: pairs (ab,ab)=10, (ab,c)=5
    assert merges[1] == ("ab", "ab")
    assert merges[2] == ("ab", "c")
    # (z,z) occurs once -> below the min-frequency stop; no more merges
    assert len(merges) == 3


def test_train_tie_breaks_lexicographic():
    # (a,b) and (c,d) both occur twice; (a,b) < (c,d)
    merges = B.train_merges([("ab", 2), ("cd", 2)], 1)
    assert merges == [("a", "b")]


def test_apply_greedy_left_to_right():
    ranks = B.merge_ranks([("x", "x")])
    assert B.apply_merges("xxx", ranks) == ["xx", "x"]
    assert B.apply_merges("xxxx", ranks) == ["xx", "xx"]


def test_apply_follows_rank_order_not_position():
    # rank 0 = (b,c); in "abc" the lower-rank pair wins even though
    # (a,b) appears first in the word
    ranks = B.merge_ranks([("b", "c"), ("a", "b")])
    assert B.apply_merges("abc", ranks) == ["a", "bc"]


def test_no_applicable_merges_returns_chars():
    assert B.apply_merges("xyz", B.merge_ranks([("a", "b")])) == ["x", "y", "z"]


def test_bpe_token_counts_matches_pure_python(spark):
    rows = [
        (1, "aaab aaab xyz"),
        (2, "aaab banana"),
        (3, "  "),  # whitespace-only: no words, no output row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = B.learn_bpe(df, "doc_id", "text", n_merges=5)
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in B.bpe_token_counts(df, "doc_id", "text", merges).collect()
    }
    ranks = B.merge_ranks(merges)
    want = {}
    for d, t in rows:
        words = t.strip().lower().split()
        if words:
            want[d] = (len(words), sum(len(B.apply_merges(w, ranks)) for w in words))
    assert got == want
    assert 3 not in got


def test_learn_bpe_spark_matches_local_trainer(spark):
    rows = [(i, "the quick brown fox the quick") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = B.learn_bpe(df, "doc_id", "text", n_merges=8)
    from collections import Counter

    c = Counter()
    for _, t in rows:
        c.update(t.strip().lower().split())
    want = B.train_merges(sorted(c.items(), key=lambda kv: (-kv[1], kv[0])), 8)
    assert got == want
