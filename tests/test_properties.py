"""Property-based tests (hypothesis) over the pure-logic core: jet
algebra, trie coverage, chain sort. No Spark in the loop — these
functions parameterize filters and run inside UDFs/applyInPandas, so
their invariants must hold on arbitrary inputs, not just fixtures.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from block_explorer_spark.functions import jets
from block_explorer_spark.operators.chain_sort import BrokenChainError, order_group

jet_ids = st.text(alphabet="01", min_size=0, max_size=12)


@given(jet_ids)
def test_invert_last_bit_is_involution(j):
    assert jets.invert_last_bit(jets.invert_last_bit(j)) == j


@given(jet_ids)
def test_parents_are_prefix_chain(j):
    parents = jets.jet_parents(j)
    assert parents[0] == "" and parents[-1] == j
    assert all(j.startswith(p) for p in parents)
    assert [len(p) for p in parents] == list(range(len(j) + 1))


@given(jet_ids)
def test_siblings_contain_self_children_parent(j):
    sib = set(jets.jet_siblings(j))
    assert {j, j + "0", j + "1"} <= sib
    if j:
        assert j[:-1] in sib


@st.composite
def split_tree_leaves(draw):
    """Random full binary split: start at root, repeatedly split a
    random leaf. The leaf set always partitions the jet space."""
    leaves = [""]
    for _ in range(draw(st.integers(min_value=0, max_value=8))):
        idx = draw(st.integers(min_value=0, max_value=len(leaves) - 1))
        j = leaves.pop(idx)
        leaves += [j + "0", j + "1"]
    return leaves


@given(split_tree_leaves())
def test_full_split_tree_is_covered(leaves):
    assert jets.trie_covered(leaves) is True


@given(split_tree_leaves())
def test_removing_any_leaf_breaks_coverage(leaves):
    if len(leaves) == 1:
        return  # root alone; removing it leaves nothing
    for i in range(len(leaves)):
        assert jets.trie_covered(leaves[:i] + leaves[i + 1 :]) is False


@given(split_tree_leaves())
def test_extra_ancestors_keep_coverage(leaves):
    # adding redundant ancestor jets can never un-cover the space
    extra = leaves + [leaf[: len(leaf) // 2] for leaf in leaves]
    assert jets.trie_covered(extra) is True


def _chain(n, obj=b"\x01", seed=0):
    rng = random.Random(seed)
    rows, prev = [], None
    for i in range(n):
        ref = bytes([i + 1]) * 4
        rows.append(
            {
                "reference": ref,
                "type": "state",
                "object_reference": obj,
                "prev_record_reference": prev,
                "position": i,
            }
        )
        prev = ref
    return rows


@given(st.integers(min_value=1, max_value=20), st.randoms(use_true_random=False))
@settings(max_examples=40)
def test_chain_sort_recovers_order_from_any_permutation(n, rnd):
    rows = _chain(n)
    want = [r["reference"] for r in rows]
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    # positions reflect arrival order, not chain order
    for i, r in enumerate(shuffled):
        r = dict(r)
        r["position"] = i
        shuffled[i] = r
    got = order_group(shuffled)
    assert [r["reference"] for r in got] == want
    assert [r["order"] for r in got] == list(range(1, n + 1))


@given(st.integers(min_value=3, max_value=15))
@settings(max_examples=20)
def test_chain_sort_detects_break_and_fork(n):
    rows = _chain(n)
    # break: remove a middle record
    broken = [dict(r) for i, r in enumerate(rows) if i != n // 2]
    try:
        order_group(broken)
        assert False, "expected BrokenChainError"
    except BrokenChainError:
        pass
    # fork: two records claim the same prev
    forked = [dict(r) for r in rows]
    forked.append(
        {
            "reference": b"\xff" * 4,
            "type": "state",
            "object_reference": b"\x01",
            "prev_record_reference": forked[0]["reference"],
            "position": n,
        }
    )
    try:
        order_group(forked)
        assert False, "expected BrokenChainError"
    except BrokenChainError:
        pass


@given(st.integers(min_value=1, max_value=10), st.integers(min_value=1, max_value=10))
@settings(max_examples=20)
def test_chain_sort_multiple_objects_independent(n1, n2):
    rows = _chain(n1, obj=b"\x0a") + [
        {**r, "position": r["position"] + n1} for r in _chain(n2, obj=b"\x0b", seed=1)
    ]
    got = order_group(rows)
    a = [r["reference"] for r in got if r["object_reference"] == b"\x0a"]
    b = [r["reference"] for r in got if r["object_reference"] == b"\x0b"]
    assert a == [r["reference"] for r in _chain(n1, obj=b"\x0a")]
    assert b == [r["reference"] for r in _chain(n2, obj=b"\x0b", seed=1)]
