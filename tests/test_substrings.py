"""Exact substring dedup (operators/substrings.py) — the Lee et al.
ExactSubstr windowed-hash form: survivor rule, span merge, strip."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from block_explorer_spark.operators import substrings as Sub


def _run(spark, rows, window):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = Sub.exact_substring_dedup(df, "doc_id", "text", window=window)
    return {r.doc_id: r.asDict() for r in out.collect()}


def test_cross_doc_duplicate_strips_later_doc_only(spark):
    shared = " ".join(f"s{i}" for i in range(6))
    rows = [
        (1, f"alpha beta {shared} gamma"),
        (2, f"x y z {shared} q r"),
    ]
    got = _run(spark, rows, window=6)
    # doc 1 holds the first occurrence of every shared window: untouched
    assert 1 not in got
    assert got[2]["n_spans"] == 1
    assert got[2]["n_removed"] == 6
    assert got[2]["cleaned_text"] == "x y z q r"
    assert got[2]["n_tokens"] == 11


def test_run_longer_than_window_merges_to_one_span(spark):
    shared = " ".join(f"s{i}" for i in range(10))  # 10-token run, W=4
    rows = [(1, shared + " tail1"), (2, "head " + shared + " tail2")]
    got = _run(spark, rows, window=4)
    assert 1 not in got
    # every interior window of the run is duplicated; they merge to
    # exactly the full 10-token run
    assert got[2]["n_spans"] == 1
    assert got[2]["n_removed"] == 10
    assert got[2]["cleaned_text"] == "head tail2"


def test_within_doc_repeat_keeps_first_occurrence(spark):
    rep = " ".join(f"r{i}" for i in range(4))
    rows = [(7, f"{rep} mid1 mid2 {rep}")]
    got = _run(spark, rows, window=4)
    assert got[7]["n_spans"] == 1
    assert got[7]["n_removed"] == 4
    assert got[7]["cleaned_text"] == f"{rep} mid1 mid2"


def test_short_docs_and_unique_docs_untouched(spark):
    rows = [
        (1, "too short"),
        (2, "all words here are entirely unique tokens one"),
        (3, "different unique vocabulary with no repeats at all"),
    ]
    got = _run(spark, rows, window=5)
    assert got == {}


def test_two_separate_spans_in_one_doc(spark):
    a = " ".join(f"a{i}" for i in range(4))
    b = " ".join(f"b{i}" for i in range(4))
    rows = [
        (1, f"{a} filler {b}"),
        (2, f"{a} unrelated middle words go here {b}"),
    ]
    got = _run(spark, rows, window=4)
    assert 1 not in got
    assert got[2]["n_spans"] == 2
    assert got[2]["n_removed"] == 8
    assert got[2]["cleaned_text"] == "unrelated middle words go here"


def _reference_exact_substr(docs: dict[int, str], window: int):
    """Pure-Python replay of the algorithm for randomized comparison."""
    toks = {d: t.split() for d, t in docs.items() if t.strip()}
    toks.update({d: [] for d, t in docs.items() if not t.strip()})
    occ: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - window + 1):
            occ.setdefault(" ".join(tk[p : p + window]), []).append((d, p))
    marked: dict[int, list[int]] = {}
    for positions in occ.values():
        if len(positions) >= 2:
            for d, p in sorted(positions)[1:]:
                marked.setdefault(d, []).append(p)
    out = {}
    for d, ps in marked.items():
        spans = []
        for p in sorted(set(ps)):
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + window)
            else:
                spans.append([p, p + window])
        removed = set()
        for s, e in spans:
            removed.update(range(s, e))
        kept = [t for i, t in enumerate(toks[d]) if i not in removed]
        out[d] = {
            "n_tokens": len(toks[d]),
            "n_spans": len(spans),
            "n_removed": len(removed),
            "cleaned_text": " ".join(kept),
        }
    return out


@pytest.mark.parametrize("seed", [11, 23])
def test_matches_bruteforce_on_random_corpus(spark, seed):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> many repeats
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for d in range(1, 31)
    }
    window = 5
    want = _reference_exact_substr(docs, window)
    got = _run(spark, list(docs.items()), window)
    assert {d: {k: v[k] for k in ("n_tokens", "n_spans", "n_removed", "cleaned_text")}
            for d, v in got.items()} == want
