"""Deterministic BPE (functions/bpe.py): trainer tie-breaks, greedy
left-to-right application, and the per-type Spark counting path."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_fast_trainer_matches_naive():
    """Round-6 item 2: the incremental-pair-count trainer must be
    byte-for-byte the naive trainer (full rescan per merge) on a
    fixture corpus — including tie-breaks, overlap handling (runs of
    one char), and early stop."""
    import random

    rng = random.Random(42)
    words = {}
    text = (
        "the quick brown fox jumps over the lazy dog repeatedly while "
        "tokenization needs deterministic byte pair encoding merges "
        "aaaa aaaaaaa banana internationalization"
    )
    for w in text.split():
        words[w] = words.get(w, 0) + rng.randint(1, 50)
    for _ in range(300):
        w = "".join(rng.choice("abcdefgh") for _ in range(rng.randint(2, 12)))
        words[w] = words.get(w, 0) + rng.randint(1, 20)
    wc = sorted(words.items())
    for n in (1, 7, 40, 300, 5000):  # 5000 > exhaustion: early stop too
        assert B.train_merges(wc, n) == B.train_merges_naive(wc, n), n


def test_fast_trainer_production_vocab_speed():
    """32k merges over a 10k-type table must train in seconds (the
    naive rescan is O(merges x types x word_len) — hours). Generous
    CI bound; the measured figure lives in SCALE.md (bpe_train)."""
    import random
    import time

    rng = random.Random(7)
    types = {}
    for _ in range(10_000):
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(3, 15))
        )
        types[w] = rng.randint(1, 1000)
    t0 = time.time()
    merges = B.train_merges(sorted(types.items()), 32_000)
    dt = time.time() - t0
    assert len(merges) == 32_000
    assert dt < 60, f"32k-merge training took {dt:.1f}s"


def test_learn_bpe_natural_text_2k_merges(spark):
    """Round-7 item 5: on a natural-morphology corpus (shared stems +
    productive affixes — generators.natural_text_corpus) the FULL
    Spark path (token aggregate → frequency-pruned type table →
    incremental trainer) certifies at >= 2000 merges, and the merge
    table equals the local trainer on locally-computed counts exactly
    (the synthetic tokNNNNN vocabulary exhausted at 89 merges, so
    production-shaped merge depths were never end-to-end-pinned)."""
    from collections import Counter

    from block_explorer_spark.sources.generators import natural_text_corpus

    df = natural_text_corpus(spark, n_docs=300, seed=11, words_per_doc=80)
    got = B.learn_bpe(df, "doc_id", "text", n_merges=2000, max_types=10_000)
    assert len(got) == 2000  # the corpus sustains production-depth merges

    c = Counter()
    for r in df.select("text").collect():
        c.update(r.text.strip().lower().split())
    types = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10_000]
    want = B.train_merges(types, 2000)
    assert got == want

    # and the applied token counts agree with a pure-python replay on
    # a document sample (the apply half of the path, at real depth)
    sample = df.filter(F.col("doc_id") < 10)
    ranks = B.merge_ranks(got)
    got_counts = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in B.bpe_token_counts(sample, "doc_id", "text", got).collect()
    }
    want_counts = {}
    for r in sample.collect():
        words = r.text.strip().lower().split()
        want_counts[r.doc_id] = (
            len(words),
            sum(len(B.apply_merges(w, ranks)) for w in words),
        )
    assert got_counts == want_counts
