"""Deterministic scale-factor data generator (sf1-capable).

Round-9 brief item 1: certification currently tops out at the driver's
sf0.1 testdata. To hash-certify the registry at 10x that scale without
touching the read-only /root/testdata, this script regenerates the same
ten-table layout (schemas, key domains, value distributions, corpus
scheme) at an arbitrary scale factor, seeded — so Spark and the DuckDB
oracle read the SAME parquet and the comparison is exactly the driver's
t2 check, just bigger.

Distributions were measured from the driver's sf0.1/sf0.01 tables
(row-count ratios, key ranges, categorical frequencies, date spans,
doc vocab/length/near-dup scheme, unit-norm 10-label embeddings); see
the per-table builders. Everything is numpy + pyarrow — sf1 (6M
lineitem) generates in well under a minute.

Usage: python scripts/gen_sf.py <out_dir> [sf]   (default sf=1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 4242

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["O", "F"]
PTYPES = ["ECONOMY", "PROMO", "MEDIUM", "LARGE", "STANDARD", "SMALL"]
PADJ = ["large", "hot", "blue", "old", "small", "fast", "dark", "new"]
PNOUN = ["ring", "bolt", "plate", "tube", "cap", "disk", "rod", "pin"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
# the driver corpus's 30-word vocabulary ("dup" is reserved for the
# near-dup mutation marker, as in the driver corpus)
VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "a", "group",
    "part", "big", "sort", "query", "fast", "the",
]

DAY_US = 86_400_000_000


def _ts_days(rng, n, start: str, n_days: int) -> pa.Array:
    base = np.datetime64(start, "us").astype(np.int64)
    us = base + rng.integers(0, n_days, n) * DAY_US
    return pa.array(us, type=pa.timestamp("us"))


def _round2(x: np.ndarray) -> np.ndarray:
    return np.round(x, 2)


def gen(out_dir: str, sf: float) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_user = max(1, int(15_000 * sf))

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        print(f"  {name}: {table.num_rows} rows")

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
    }))
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": _round2(rng.uniform(-1000, 10000, n_cust)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": _round2(rng.uniform(-1000, 10000, n_supp)),
    }))
    adj = np.array(PADJ)[rng.integers(0, len(PADJ), n_part)]
    noun = np.array(PNOUN)[rng.integers(0, len(PNOUN), n_part)]
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), type=pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": _round2(900.0 + (np.arange(n_part) % 1000) / 10.0),
    }))
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), type=pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": _round2(rng.uniform(1000, 500000, n_ord)),
        "o_orderdate": _ts_days(rng, n_ord, "1995-01-01", 2405),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), type=pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), type=pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), type=pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _round2(rng.uniform(900, 105000, n_li)),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(LINESTATUSES)[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_days(rng, n_li, "1995-01-02", 2499),
    }))
    ts_us = (np.datetime64("2024-01-01", "us").astype(np.int64)
             + rng.integers(0, 30 * DAY_US, n_evt))
    write("events", pa.table({
        "event_id": pa.array(np.arange(n_evt), type=pa.int64()),
        "ts": pa.array(np.sort(ts_us) if False else ts_us, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_user, n_evt), type=pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": _round2(rng.gamma(2.0, 38.0, n_evt)),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)],
    }))

    # documents — driver scheme: uniform 10-99 word docs over the
    # 30-word vocab; ~5% are near-dups (copy of an earlier LONG doc
    # with one word mutated to "dup", so pair jaccard on 3-gram
    # shingles sits >= ~0.9, comfortably above the q24/q25 0.8
    # threshold and the LSH S-curve; see q25's recall note).
    vocab = np.array(VOCAB)
    lengths = rng.integers(10, 100, n_doc)
    texts: list[str] = [
        " ".join(vocab[rng.integers(0, 30, ln)]) for ln in lengths
    ]
    # Near-dup pairs must sit WELL above the 0.8 jaccard threshold or
    # q25's LSH-recall==exact property gets probabilistic: two mutants
    # of the SAME source differ in 2 words (j >= 0.81 at 60 words —
    # right on the S-curve edge, ~3% per-pair miss odds). So sources
    # are drawn WITHOUT replacement and never from the mutated set:
    # every true pair is then source-vs-its-single-mutant with one
    # word changed in a >=60-word doc — j >= 0.90, miss odds ~1e-4.
    n_dup = int(0.05 * n_doc)
    dup_targets = set(
        int(x) for x in rng.choice(np.arange(n_doc // 10, n_doc), size=n_dup, replace=False)
    )
    long_ids = np.array(
        [i for i in range(n_doc) if lengths[i] >= 60 and i not in dup_targets]
    )
    srcs = rng.choice(long_ids, size=min(n_dup, len(long_ids)), replace=False)
    for t, src in zip(sorted(dup_targets), srcs):
        words = texts[int(src)].split(" ")
        words[int(rng.integers(0, len(words)))] = "dup"
        texts[t] = " ".join(words)
    langs = np.array(["en", "en", "en", "zh", "de", "es", "fr"])
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), type=pa.int64()),
        "text": texts,
        "lang": pa.array(langs[rng.integers(0, 7, n_doc)]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    # embeddings — unit-norm 64-d, 10 label clusters (driver layout)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.standard_normal((n_emb, 64)) * 0.33
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), type=pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)), type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }))


if __name__ == "__main__":
    out = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    print(f"generating sf={sf} -> {out} (seed {SEED})")
    gen(out, sf)
    print("done")
