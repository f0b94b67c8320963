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


def train_merges(
    word_counts: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn up to `n_merges` BPE merges from (word, count) pairs.
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
