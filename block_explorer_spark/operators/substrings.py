"""Exact substring deduplication — the Lee et al. 2022 operator
("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499, the ExactSubstr dedup): find long verbatim token
runs that occur more than once across the corpus and REMOVE every
occurrence except the first, stripping matched spans from documents
rather than dropping the documents.

The reference implementation builds a corpus-wide suffix array — a
global sort over every byte, inherently single-machine-hostile. The
distributed re-expression here is the windowed-hash form (the same
candidate structure BigQuery/Spark ports of ExactSubstr use):

  1. slide a W-token window (stride 1) over each document and hash
     the window text — doc-local, happens inside the scan stage, no
     shuffle; cost O(n_tokens * W) per doc;
  2. one hash-shuffle groups identical windows; every occurrence of
     a window seen >= 2 times EXCEPT the globally-first one
     (min (doc_id, pos)) is marked — at 100 TB the shuffle carries
     only (whash, doc_id, pos) rows, 8+8+4 bytes per token of
     corpus, never the window text;
  3. marked windows merge doc-locally into maximal spans
     (gaps-and-islands over pos: a window starting at or before the
     running max end extends the span) — one shuffle on doc_id;
  4. spans are stripped from the token stream and the text rebuilt.

Equivalence to suffix-array ExactSubstr: any duplicated run of
length >= W yields duplicated windows at every interior offset, so
the merged span recovers the full run; runs shorter than W are below
the dedup threshold by definition (Lee et al. use W=50 tokens).
A duplicated run appearing in docs A < B leaves A intact and strips
B — the survivor rule is per-window, so a doc keeps exactly the
windows for which it is the globally-first occurrence.

The window hash is `substr(md5(window_text), 1, 16)` so the DuckDB
oracle replicates it bit-for-bit; production at 100 TB would swap in
xxhash64 (same plan shape, cheaper hash) via `hash_fn`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from block_explorer_spark.operators.dedup import _spread

#: Lee et al. 2022 §3: spans shorter than 50 tokens are not dedup'd.
DEFAULT_WINDOW = 50


def _toks(text_col: str) -> Column:
    """Whitespace tokens of the trimmed text; empty text -> empty
    array (split('') would yield [''] — one phantom token)."""
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == F.lit(0), F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def _md5_window_hash(win: Column) -> Column:
    """Default window hash: md5 hex prefix of the space-joined slice.

    Kept as the DEFAULT because the incremental corpus store persists
    these values in its whash sidecar (StringType, hex-nibble
    partitioned — corpus_store.py) and the DuckDB oracle replays them
    bit-for-bit; both pin the string form.
    """
    return F.substring(F.md5(F.concat_ws(" ", win)), 1, 16)


def xxh64_window_hash(win: Column) -> Column:
    """Scale window hash: xxhash64 directly over the token-slice array
    (order-sensitive element chaining) — no concat_ws string build, no
    cryptographic digest, and the shuffled key is 8 bytes instead of a
    16-char string. Grouping-equivalent to the md5 form: both truncate
    to 64 bits, so the collision-equivalence classes are the same
    strength, and the operator's OUTPUT never exposes the hash."""
    return F.xxhash64(win)


def token_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = DEFAULT_WINDOW,
    hash_fn=None,
) -> DataFrame:
    """(id, pos, whash) for every W-token sliding window, stride 1.

    Doc-local: the transform/slice/hash pipeline runs inside the scan
    stage (no shuffle, no per-doc sort — the alternative
    posexplode + ROWS-window formulation shuffles every token on
    doc_id first). Docs shorter than W tokens emit nothing.

    `hash_fn` receives the TOKEN-SLICE ARRAY column (r11: was the
    pre-joined string; no external caller passed one) and returns the
    window-hash column. Default `_md5_window_hash` reproduces the
    historical md5-of-joined-string bytes exactly.
    """
    hash_fn = hash_fn or _md5_window_hash
    # no .otherwise: the non-matching branch is NULL and posexplode
    # emits zero rows for NULL — same semantics as an empty array,
    # without pinning the array element type to the hash's type
    wins = F.when(
        F.size("__toks") >= F.lit(window),
        F.transform(
            F.sequence(F.lit(0), F.size("__toks") - F.lit(window)),
            lambda i: hash_fn(F.slice(F.col("__toks"), i + F.lit(1), window)),
        ),
    )
    return (
        _spread(df)
        .select(F.col(id_col), _toks(text_col).alias("__toks"))
        .select(id_col, F.posexplode(wins).alias("pos", "whash"))
    )


def marked_occurrences(wins: DataFrame, id_col: str) -> DataFrame:
    """Every (id, pos) whose window also occurs elsewhere and is NOT
    the globally-first occurrence (min (id, pos) per whash survives —
    Lee et al. keep one copy of each duplicated substring).

    One hash-shuffle on whash; the two window functions share its
    partitioning.
    """
    w = Window.partitionBy("whash")
    ranked = wins.select(
        id_col,
        "pos",
        F.row_number().over(w.orderBy(id_col, "pos")).alias("__rn"),
        F.count(F.lit(1)).over(w).alias("__occ"),
    )
    return ranked.filter((F.col("__occ") >= 2) & (F.col("__rn") > 1)).select(
        id_col, "pos"
    )


def merge_spans(
    marked: DataFrame, id_col: str, window: int = DEFAULT_WINDOW
) -> DataFrame:
    """Merge marked windows [pos, pos+W) into maximal disjoint spans
    per document (gaps-and-islands: a window starting at or before
    the running max end — overlap or exact adjacency — extends the
    current span). One shuffle on id_col; output
    (id, span_start, span_end), end exclusive.
    """
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(window)).over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    with_isl = marked.withColumn(
        "__new", (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("int")
    ).withColumn("__span", F.sum("__new").over(wdoc))
    return with_isl.groupBy(id_col, "__span").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(window)).alias("span_end"),
    ).drop("__span")


def strip_spans(
    df: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Remove span token-ranges from each document that has any;
    rebuild the text from surviving tokens (single-space joined).

    Output (docs WITH at least one span only): id, n_tokens, n_spans,
    n_removed, cleaned_text. Spans arrive disjoint (merge_spans), so
    n_removed = sum of span lengths. The per-doc span list is
    collected into an array (bounded: spans per doc <= n_tokens / W)
    and the strip is a doc-local filter over the token array.
    """
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__sp"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("n_removed"),
    )
    kept = F.filter(
        F.transform(
            F.col("__toks"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))
        ),
        lambda x: ~F.exists(
            F.col("__sp"),
            lambda s: (x["i"] >= s["span_start"]) & (x["i"] < s["span_end"]),
        ),
    )
    return (
        df.select(F.col(id_col), _toks(text_col).alias("__toks"))
        .join(per_doc, id_col)
        .withColumn("n_tokens", F.size("__toks"))
        .withColumn(
            "cleaned_text",
            F.concat_ws(" ", F.transform(kept, lambda x: x["t"])),
        )
        .select(id_col, "n_tokens", "n_spans", "n_removed", "cleaned_text")
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = DEFAULT_WINDOW,
    hash_fn=None,
) -> DataFrame:
    """The composed ExactSubstr pass. Returns one row per document
    that lost at least one span: (id, n_tokens, n_spans, n_removed,
    cleaned_text). Documents not returned are untouched survivors.

    Two shuffles total (whash group, doc_id span merge) plus the
    span join — never pairwise, never a global sort; the suffix-array
    global order the reference algorithm needs is replaced by the
    window-hash equivalence class.
    """
    wins = token_windows(df, id_col, text_col, window, hash_fn)
    marked = marked_occurrences(wins, id_col)
    spans = merge_spans(marked, id_col, window)
    return strip_spans(df, spans, id_col, text_col)
