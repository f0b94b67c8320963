"""Manifest commit protocol (sources/manifest.py): CAS atomicity,
snapshot isolation, vacuum."""

from __future__ import annotations

import os

import pytest

from block_explorer_spark.sources import manifest as Mf


@pytest.fixture()
def base(tmp_path):
    return str(tmp_path / "store")


def _touch(base, rel):
    p = os.path.join(base, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(b"x")
    return rel


def test_empty_store_reads_version_zero(base):
    m = Mf.read(base)
    assert m["version"] == 0 and m["families"] == {}
    assert Mf.live_files(base, "docs") == []


def test_commit_and_read_roundtrip(base):
    rels = [_touch(base, "data/a.parquet"), _touch(base, "data/b.parquet")]
    v = Mf.commit(base, {"docs": rels}, expect_version=0)
    assert v == 1
    m = Mf.read(base)
    assert m["version"] == 1
    assert sorted(m["families"]["docs"]) == sorted(rels)
    assert Mf.live_files(base, "docs") == sorted(os.path.join(base, r) for r in rels)


def test_cas_conflict_exactly_one_winner(base):
    _touch(base, "data/a.parquet")
    Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    # two writers both read v1, both try to commit v2
    _touch(base, "data/b.parquet")
    _touch(base, "data/c.parquet")
    Mf.commit(base, {"docs": ["data/a.parquet", "data/b.parquet"]}, expect_version=1)
    with pytest.raises(Mf.CommitConflict):
        Mf.commit(
            base, {"docs": ["data/a.parquet", "data/c.parquet"]}, expect_version=1
        )
    # the loser's state never became visible
    assert "data/c.parquet" not in Mf.read(base)["families"]["docs"]


def test_old_snapshot_remains_readable_after_new_commit(base):
    _touch(base, "data/a.parquet")
    Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    snap = Mf.read(base)
    _touch(base, "data/b.parquet")
    Mf.commit(base, {"docs": ["data/b.parquet"]}, expect_version=1)  # drops a
    # a reader pinned to the old snapshot still lists (and can read) a
    assert Mf.live_files(base, "docs", snap) == [os.path.join(base, "data/a.parquet")]
    assert os.path.exists(os.path.join(base, "data/a.parquet"))


def test_vacuum_removes_only_unreferenced(base):
    _touch(base, "data/a.parquet")
    _touch(base, "data/orphan.parquet")  # staged, never committed
    Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    _touch(base, "data/b.parquet")
    Mf.commit(base, {"docs": ["data/b.parquet"]}, expect_version=1)
    removed = Mf.vacuum(base, keep_last=1)
    # a.parquet (dropped by v2) + orphan
    assert removed == 2
    assert not os.path.exists(os.path.join(base, "data/a.parquet"))
    assert not os.path.exists(os.path.join(base, "data/orphan.parquet"))
    assert os.path.exists(os.path.join(base, "data/b.parquet"))
    # old manifest versions pruned, current kept
    assert Mf.read(base)["version"] == 2


def test_vacuum_keep_last_protects_recent_snapshots(base):
    _touch(base, "data/a.parquet")
    Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    _touch(base, "data/b.parquet")
    Mf.commit(base, {"docs": ["data/b.parquet"]}, expect_version=1)
    assert Mf.vacuum(base, keep_last=2) == 0  # v1's file still protected
    assert os.path.exists(os.path.join(base, "data/a.parquet"))


def test_discard_removes_staged_files(base):
    rel = _touch(base, "data/x.parquet")
    Mf.discard(base, [rel])
    assert not os.path.exists(os.path.join(base, rel))
    Mf.discard(base, [rel])  # idempotent


def test_vacuum_min_age_protects_in_flight_staged_files(base):
    """A writer stages files BEFORE committing; vacuum with a grace
    window must not eat them."""
    _touch(base, "data/a.parquet")
    Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    staged = _touch(base, "data/in-flight.parquet")  # fresh, uncommitted
    assert Mf.vacuum(base, min_age_s=3600) == 0
    assert os.path.exists(os.path.join(base, staged))
    # the same file IS removable once old enough
    old = os.path.join(base, staged)
    os.utime(old, (0, 0))
    assert Mf.vacuum(base, min_age_s=3600) == 1
    assert not os.path.exists(old)
