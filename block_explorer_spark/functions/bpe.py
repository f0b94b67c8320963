"""Deterministic byte-pair encoding for token accounting.

Real pipelines budget BPE tokens, not whitespace words (a 2000-char
URL is one whitespace token but dozens of BPE tokens). This is the
public Sennrich et al. 2016 / GPT-2 merge algorithm, made fully
deterministic so a SQL oracle can replay tokenization from the same
learned merge table:

  training — over WORD TYPES with their corpus frequencies (the
  standard trick: merges depend only on the type/frequency table,
  never the token stream): repeatedly take the most frequent adjacent
  symbol pair (ties -> lexicographically smallest pair) and add it to
  the merge list, until `n_merges` merges or no pair occurs twice;

  application — per word, repeatedly merge ALL occurrences
  (greedy left-to-right) of the lowest-rank adjacent pair present,
  until none applies. Depends only on the word and the merge list,
  so application is a per-TYPE computation: tokenizing a corpus is
  `distinct words -> apply -> join back`, never per-token Python.

Spark layout (the 100 TB posture):
  - training input is ONE groupBy(word) aggregate, frequency-pruned
    to `max_types` rows before the bounded driver-side merge loop
    (the same bounded-model pattern as IVF centroid training);
  - application is an Arrow-batched pandas UDF over the distinct-word
    table (per-type, so corpus repetition is free), joined back onto
    the exploded token stream — broadcast when the type table is
    small, plain shuffle join otherwise (AQE decides).

Symbols are characters of the (lowercased, whitespace-split) word,
no end-of-word marker; symbols therefore never contain whitespace,
which is what lets the DuckDB oracle replay application with
space-separated symbol strings.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_merges_naive(
    word_counts: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Reference trainer: full pair rescan per merge — O(merges x
    types x word_len). Kept as the executable spec the fast trainer
    is parity-pinned against (test_bpe::test_fast_trainer_matches_
    naive); use `train_merges` for anything bigger than a fixture.
    Deterministic: best pair = max count, ties by smallest (a, b).
    Stops early when no adjacent pair occurs at least twice."""
    seqs: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in word_counts if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for syms, c in seqs:
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        a, b = best[0]
        for syms, _ in seqs:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
    return merges


def _pairs(syms: list[str]) -> Counter:
    return Counter(zip(syms, syms[1:]))


def _merge_in_word(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (a, b) — the
    exact in-word semantics of the naive trainer's in-place loop."""
    out: list[str] = []
    i = 0
    ab = a + b
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_merges(
    word_counts: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn up to `n_merges` BPE merges from (word, count) pairs —
    incremental-pair-count trainer (the standard BPE training
    optimization, as in Sennrich's public learn_bpe): after a merge,
    only the pair counts adjacent to the merged pair's occurrences
    change, so each round touches ONLY the word types containing the
    winning pair instead of rescanning every type. A lazy max-heap
    (stale entries skipped on pop) picks the winner in O(log P).

    Byte-for-byte the same output as `train_merges_naive` (pinned by
    test_bpe) at O((types x word_len) + merges x touched) instead of
    O(merges x types x word_len) — the difference between hours and
    seconds at a production 32k-merge vocabulary (SCALE.md row
    `bpe_train`). Deterministic: best pair = max count, ties by
    smallest (a, b); stops when no pair occurs at least twice."""
    import heapq

    seqs: list[list[str]] = []
    freqs: list[int] = []
    for w, c in word_counts:
        if w:
            seqs.append(list(w))
            freqs.append(int(c))

    pair_counts: Counter = Counter()
    pair_where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, c) in enumerate(zip(seqs, freqs)):
        for pair, k in _pairs(syms).items():
            pair_counts[pair] += k * c
            pair_where.setdefault(pair, set()).add(idx)

    # heap of (-count, pair); entries go stale when counts change —
    # validity is checked against pair_counts on pop. Tuple order
    # gives exactly the naive tie-break: max count, then smallest
    # pair lexicographically.
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        neg, pair = heapq.heappop(heap)
        cur = pair_counts.get(pair, 0)
        if -neg != cur or cur == 0:
            continue  # stale entry
        if cur < 2:
            break
        merges.append(pair)
        a, b = pair
        touched: set[tuple[str, str]] = set()
        for idx in pair_where.pop(pair, ()):
            syms = seqs[idx]
            before = _pairs(syms)
            if (a, b) not in before:
                continue  # stale membership (pair merged away earlier)
            after_syms = _merge_in_word(syms, a, b)
            seqs[idx] = after_syms
            after = _pairs(after_syms)
            c = freqs[idx]
            for p in before.keys() | after.keys():
                d = (after.get(p, 0) - before.get(p, 0)) * c
                if d:
                    pair_counts[p] += d
                    touched.add(p)
                if after.get(p):
                    pair_where.setdefault(p, set()).add(idx)
        # the merged pair itself is gone everywhere; re-heap the
        # final counts of every changed pair (stale heap entries are
        # skipped on pop)
        pair_counts.pop(pair, None)
        touched.discard(pair)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c <= 0:
                pair_counts.pop(p, None)
            else:
                heapq.heappush(heap, (-c, p))
    return merges


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {p: r for r, p in enumerate(merges)}


def apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word: repeatedly merge every (greedy left-to-right)
    occurrence of the lowest-rank adjacent pair present."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        a, b = None, None
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                a, b = pair
        if best_rank is None:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _word_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w) token stream: lowercased whitespace split, empty text
    contributes nothing (the q92/q93 tokenizer)."""
    from block_explorer_spark.operators.dedup import _spread

    t = F.trim(F.col(text_col))
    return (
        _spread(df)
        .filter(F.length(t) > 0)
        .select(F.col(id_col), F.explode(F.split(F.lower(t), r"\s+")).alias("w"))
    )


def learn_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int,
    max_types: int = 10_000,
) -> list[tuple[str, str]]:
    """Corpus-side training: one word-type aggregate, frequency-pruned
    to `max_types` rows (count desc, word asc — deterministic), then
    the bounded driver-side merge loop."""
    counts = (
        _word_tokens(df, id_col, text_col)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_types)
        .collect()
    )
    return train_merges([(r.w, r.c) for r in counts], n_merges)


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document with >= 1 word.

    Per-TYPE application: distinct words -> Arrow-batched apply ->
    join the (word, len) table back onto the token stream. The join
    side is |vocabulary| rows regardless of corpus size."""
    ranks = merge_ranks(merges)

    @F.pandas_udf("int")
    def _bpe_len(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(apply_merges(w, ranks)))

    # NOTE (r12, measured and REJECTED): pre-aggregating the token
    # stream to (doc, word, k) so the distinct-word branch shares one
    # exchange looked like a §7.2 duplicated-subtree fix, but the
    # interleaved A/B read +8..15% at sf0.1 — the (id, w) aggregate
    # shuffles nearly every token row (in-doc repeats are rare, so
    # k≈1 and the partial agg reduces nothing), while the "duplicate"
    # branches already share the _spread exchange at runtime. Kept as
    # the original two-branch shape.
    tok = _word_tokens(df, id_col, text_col)
    type_lens = tok.select("w").distinct().withColumn("n_bpe", _bpe_len("w"))
    return (
        tok.join(type_lens, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_bpe").cast("long").alias("n_bpe_tokens"),
        )
    )
