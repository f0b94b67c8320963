"""r12 hot-pivot wedge blocking (operators/graph.py WEDGE_BLOCK):
the wedge self-join hash-partitions by pivot, so one max-degree pivot
used to put its whole quadratic expansion in ONE task. Pivots above
WEDGE_BLOCK now go through the blocked (s, p, q) block-pair join.
These tests pin exact-count equivalence between the two paths on a
skewed fixture and the corner identity on a clique (whose lowest-id
vertex IS the hot pivot under degree-ordered orientation)."""

from __future__ import annotations

import random

from block_explorer_spark.operators import graph as G


def _fixture_edges():
    rnd = random.Random(7)
    k = 60  # clique: vertex 0 gets oriented out-degree k-1 = 59
    edges = [(i, j) for i in range(k) for j in range(i + 1, k)]
    seen = set(edges)
    target = len(edges) + 400
    while len(edges) < target:
        u, v = rnd.randrange(100, 400), rnd.randrange(100, 400)
        e = (min(u, v), max(u, v))
        if u != v and e not in seen:
            seen.add(e)
            edges.append(e)
    return edges


def test_blocked_wedge_join_matches_plain_path(spark, monkeypatch):
    df = spark.createDataFrame(_fixture_edges(), "u long, v long")

    monkeypatch.setattr(G, "WEDGE_BLOCK", 1 << 30)  # force plain path
    plain = sorted(tuple(r) for r in G.triangle_counts(df).collect())

    monkeypatch.setattr(G, "WEDGE_BLOCK", 8)  # force blocked path
    blocked = sorted(tuple(r) for r in G.triangle_counts(df).collect())

    assert blocked == plain
    counts = dict(plain)
    # every clique vertex sits in C(k-1, 2) triangles
    assert counts[0] == 59 * 58 // 2


def test_blocked_path_bounds_single_pivot_fanout(spark, monkeypatch):
    """One hot pivot's pair space must split across many (s, p, q)
    groups: with block size B and out-degree c, the blocked plan joins
    ceil(c/B)*(ceil(c/B)+1)/2 block pairs instead of one s-group. The
    observable contract: the blocked path produces the same exact
    counts while WEDGE_BLOCK is far below the hot pivot's degree."""
    k = 40
    star_plus = [(i, j) for i in range(k) for j in range(i + 1, k)]
    df = spark.createDataFrame(star_plus, "u long, v long")
    monkeypatch.setattr(G, "WEDGE_BLOCK", 4)  # 39/4 -> 10 blocks
    out = dict(
        (r["id"], r["triangles"]) for r in G.triangle_counts(df).collect()
    )
    expect = (k - 1) * (k - 2) // 2
    assert all(v == expect for v in out.values()) and len(out) == k
