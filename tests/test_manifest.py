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
    removed = Mf.vacuum(base, keep_last=1, min_age_s=0)
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
    assert Mf.vacuum(base, keep_last=2, min_age_s=0) == 0  # v1's file still protected
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


# ---------------------------------------------------------------- round 6


def test_read_retries_when_version_vacuumed_mid_read(base, monkeypatch):
    """TOCTOU (round-5 ADVICE): between current_version's listdir and
    opening v{N}.json, a commit + vacuum(keep_last=1) can delete N.
    read() must re-resolve and return the newer manifest, not raise."""
    _touch(base, "data/a.parquet")
    Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    _touch(base, "data/b.parquet")
    Mf.commit(base, {"docs": ["data/b.parquet"]}, expect_version=1)
    # simulate the race: first resolution points at a version that a
    # concurrent vacuum already deleted
    real = Mf.current_version
    calls = {"n": 0}

    def flaky(b):
        calls["n"] += 1
        if calls["n"] == 1:
            return 99  # resolved, then vanished before open()
        return real(b)

    monkeypatch.setattr(Mf, "current_version", flaky)
    m = Mf.read(base)
    assert m["version"] == 2 and m["families"]["docs"] == ["data/b.parquet"]
    assert calls["n"] >= 2


def test_read_gives_up_after_bounded_retries(base, monkeypatch):
    monkeypatch.setattr(Mf, "current_version", lambda b: 123)
    with pytest.raises(FileNotFoundError):
        Mf.read(base)


def test_commit_survives_nfs_link_retransmit_quirk(base, monkeypatch):
    """On NFS, link(2) can report failure although the link WAS created
    (retried request hits the now-existing target). commit() must
    detect st_nlink==2 and treat it as success — raising CommitConflict
    would make the winner discard files its own manifest references."""
    _touch(base, "data/a.parquet")
    real_link = os.link

    def quirky_link(src, dst):
        real_link(src, dst)  # the link happens...
        raise OSError(5, "EIO: NFS retransmit")  # ...but the reply is lost

    monkeypatch.setattr(os, "link", quirky_link)
    v = Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    assert v == 1
    monkeypatch.undo()
    assert Mf.read(base)["families"]["docs"] == ["data/a.parquet"]
    # and a REAL conflict still raises
    _touch(base, "data/b.parquet")
    with pytest.raises(Mf.CommitConflict):
        Mf.commit(base, {"docs": ["data/b.parquet"]}, expect_version=0)


def test_vacuum_default_min_age_protects_fresh_orphans(base):
    """round-5 ADVICE: safety is the default — a vacuum with default
    args must not eat a just-staged (fresh) uncommitted file."""
    _touch(base, "data/a.parquet")
    Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    staged = _touch(base, "data/in-flight.parquet")
    assert Mf.vacuum(base) == 0  # defaults: min_age_s=300
    assert os.path.exists(os.path.join(base, staged))


def test_inflight_write_survives_zero_min_age_vacuum(base):
    """Commit-window tracking (round-6 item 7): a writer that
    registered via begin_write keeps its staged-but-uncommitted files
    through a concurrent vacuum even with min_age_s=0; after end_write
    the same files are ordinary vacuum-able orphans."""
    _touch(base, "data/a.parquet")
    Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    token = Mf.begin_write(base)
    staged = _touch(base, "data/slow-writer.parquet")  # staged after start
    assert Mf.vacuum(base, min_age_s=0) == 0
    assert os.path.exists(os.path.join(base, staged))
    Mf.end_write(base, token)
    assert Mf.vacuum(base, min_age_s=0) == 1
    assert not os.path.exists(os.path.join(base, staged))


def test_inflight_lease_expires_for_crashed_writer(base, monkeypatch):
    """A writer that died without end_write must not block vacuum
    forever: markers older than the TTL are ignored and removed."""
    _touch(base, "data/a.parquet")
    Mf.commit(base, {"docs": ["data/a.parquet"]}, expect_version=0)
    token = Mf.begin_write(base)
    staged = _touch(base, "data/crashed.parquet")
    marker = os.path.join(base, "_manifest", token)
    # age the marker AND the staged file past the lease
    import json as _json

    with open(marker, "w") as f:
        _json.dump({"start": 1.0}, f)
    os.utime(os.path.join(base, staged), (0, 0))
    assert Mf.vacuum(base, min_age_s=0) == 1
    assert not os.path.exists(marker)


def test_write_intent_context_manager(base):
    with Mf.write_intent(base):
        assert Mf._oldest_inflight_start(base) is not None
    assert Mf._oldest_inflight_start(base) is None


def test_adopt_migrates_pre_manifest_files(base):
    """round-5 ADVICE: a store directory written before the manifest
    log existed must not silently read as empty — adopt() commits the
    orphans, and it is idempotent."""
    a = _touch(base, "corpus/fp_bucket=1/a.parquet")
    b = _touch(base, "corpus/fp_bucket=2/b.parquet")
    c = _touch(base, "bands/c.parquet")
    assert Mf.read(base)["version"] == 0
    n = Mf.adopt(base, {"docs": "corpus", "bands": "bands"})
    assert n == 3
    m = Mf.read(base)
    assert m["version"] == 1
    assert sorted(m["families"]["docs"]) == sorted([a, b])
    assert m["families"]["bands"] == [c]
    # idempotent: nothing new to adopt, no new version
    assert Mf.adopt(base, {"docs": "corpus", "bands": "bands"}) == 0
    assert Mf.read(base)["version"] == 1
    # files arriving out-of-band later can be adopted incrementally
    d = _touch(base, "corpus/fp_bucket=3/d.parquet")
    assert Mf.adopt(base, {"docs": "corpus"}) == 1
    assert d in Mf.read(base)["families"]["docs"]
