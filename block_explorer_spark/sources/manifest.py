"""Mini transaction log for parquet-backed stores (corpus_store /
vector_store): optimistic-concurrency manifest commits.

The reference gets transactional writes from Postgres
(`etl/storage/storage.go:28-82`); plain parquet directories have no
such log, so the round-4 stores were single-writer by contract with a
periodic canonicalize sweep as the repair. This module closes both
gaps with the standard lakehouse recipe (the Delta/Iceberg core,
reduced to its minimum):

  - data files are IMMUTABLE and uniquely named; writers stage them
    into the data directory but nothing reads a file that is not
    listed in a committed manifest;
  - a manifest is one JSON file `_manifest/v{N}.json` listing every
    live file per family (docs + their index sidecars commit in ONE
    swap, so they can never desync);
  - commit is compare-and-swap: the writer names the version it read
    (`expect_version`); the manifest is written to a temp file and
    `os.link`ed to its final name — link(2) fails atomically if the
    version already exists, so exactly one of two racing writers wins
    and the loser re-reads, re-validates, and retries;
  - deletes never remove files inline: a new manifest simply stops
    listing them, so a reader holding the old manifest keeps a
    consistent snapshot; `vacuum` physically removes unreferenced
    files later.

On a shared filesystem (HDFS/NFS/local) link/rename are atomic; on
object stores the same protocol runs against a conditional-PUT
(if-none-match) — the commit primitive is the only thing to swap.
"""

from __future__ import annotations

import json
import os
import uuid


class CommitConflict(Exception):
    """Another writer committed the version this writer expected to
    create. Re-read the manifest, re-validate, retry."""


_MANIFEST_DIR = "_manifest"


def _mdir(base: str) -> str:
    return os.path.join(base, _MANIFEST_DIR)


def _vpath(base: str, version: int) -> str:
    return os.path.join(_mdir(base), f"v{version:012d}.json")


def current_version(base: str) -> int:
    """Highest committed version, 0 if the store has none."""
    try:
        names = os.listdir(_mdir(base))
    except FileNotFoundError:
        return 0
    versions = [
        int(n[1:-5]) for n in names if n.startswith("v") and n.endswith(".json")
    ]
    return max(versions, default=0)


def read(base: str) -> dict:
    """The latest committed manifest:
    {"version": N, "families": {name: [relpath, ...]}, "meta": {...}}.
    Version 0 (nothing committed) has empty families."""
    v = current_version(base)
    if v == 0:
        return {"version": 0, "families": {}, "meta": {}}
    with open(_vpath(base, v)) as f:
        m = json.load(f)
    m["version"] = v
    return m


def live_files(base: str, family: str, manifest: dict | None = None) -> list[str]:
    """Absolute paths of the family's live files under the latest (or
    given) manifest, sorted for deterministic plans."""
    m = manifest if manifest is not None else read(base)
    return sorted(os.path.join(base, rel) for rel in m["families"].get(family, []))


def commit(
    base: str,
    families: dict[str, list[str]],
    expect_version: int,
    meta: dict | None = None,
) -> int:
    """Atomically publish `families` (relpaths, the COMPLETE live set)
    as version expect_version + 1. Raises CommitConflict if any other
    writer committed first."""
    os.makedirs(_mdir(base), exist_ok=True)
    new_version = expect_version + 1
    body = {"families": {k: sorted(v) for k, v in families.items()},
            "meta": meta or {}}
    tmp = os.path.join(_mdir(base), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(body, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _vpath(base, new_version))  # atomic CAS
    except FileExistsError as e:
        raise CommitConflict(f"version {new_version} already committed") from e
    finally:
        os.unlink(tmp)
    return new_version


def stage_move(staging_dir: str, data_dir: str) -> list[str]:
    """Move every data file written under `staging_dir` (preserving
    partition subdirectories) into `data_dir` under a fresh unique
    name. Returns relpaths RELATIVE TO data_dir's parent store layout,
    i.e. '<data_dir_name>/<partition...>/<file>'. The moved files are
    invisible until a manifest lists them."""
    out: list[str] = []
    data_name = os.path.basename(data_dir.rstrip(os.sep))
    for root, _dirs, files in os.walk(staging_dir):
        rel_dir = os.path.relpath(root, staging_dir)
        for fn in files:
            if fn.startswith(("_", ".")):  # _SUCCESS, checksums
                continue
            target_dir = (
                data_dir if rel_dir == "." else os.path.join(data_dir, rel_dir)
            )
            os.makedirs(target_dir, exist_ok=True)
            unique = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(root, fn), os.path.join(target_dir, unique))
            rel = (
                os.path.join(data_name, unique)
                if rel_dir == "."
                else os.path.join(data_name, rel_dir, unique)
            )
            out.append(rel)
    return out


def stage_df(df, base: str, data_name: str, partition_by: str | None = None) -> list[str]:
    """Write a DataFrame to a staging dir, move its files (uniquely
    renamed, partition subdirs preserved) into base/data_name, return
    their manifest relpaths. Invisible until a commit lists them."""
    import shutil

    staging = os.path.join(base, f".staging-{uuid.uuid4().hex}")
    try:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(staging)
        return stage_move(staging, os.path.join(base, data_name))
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def discard(base: str, relpaths: list[str]) -> None:
    """Remove staged-but-uncommitted files (the loser's cleanup after
    a CommitConflict). Only ever called on files the caller itself
    staged, so no reader can hold them."""
    for rel in relpaths:
        try:
            os.unlink(os.path.join(base, rel))
        except FileNotFoundError:
            pass


def vacuum(base: str, keep_last: int = 1, min_age_s: float = 0.0) -> int:
    """Physically delete files referenced by NO manifest among the
    latest `keep_last` versions, plus older manifest versions
    themselves. Returns the number of data files removed.

    `min_age_s` is the concurrency guard: a writer stages files
    BEFORE its commit lists them, so an unreferenced file younger
    than the stage-to-commit window may belong to an in-flight write
    — vacuum skips files modified within `min_age_s` seconds. Set it
    above the longest expected commit window in production (and above
    any reader-snapshot lifetime when keep_last=1); tests that
    fabricate orphans use the 0 default."""
    v = current_version(base)
    if v == 0:
        return 0
    live: set[str] = set()
    kept_versions = range(max(1, v - keep_last + 1), v + 1)
    for kv in kept_versions:
        try:
            with open(_vpath(base, kv)) as f:
                m = json.load(f)
        except FileNotFoundError:
            continue
        for rels in m["families"].values():
            live.update(rels)
    # referenced data directories = first path component of any
    # relpath ever committed (scan all manifests for dir discovery)
    data_dirs: set[str] = set()
    for name in os.listdir(_mdir(base)):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        with open(os.path.join(_mdir(base), name)) as f:
            m = json.load(f)
        for rels in m["families"].values():
            data_dirs.update(rel.split(os.sep, 1)[0] for rel in rels)
    import time

    now = time.time()
    removed = 0
    for d in data_dirs:
        droot = os.path.join(base, d)
        if not os.path.isdir(droot):
            continue
        for root, _dirs, files in os.walk(droot, topdown=False):
            for fn in files:
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, base)
                if rel in live:
                    continue
                try:
                    if min_age_s and now - os.path.getmtime(full) < min_age_s:
                        continue  # possibly a racing writer's staged file
                    os.unlink(full)
                    removed += 1
                except FileNotFoundError:
                    pass  # racing vacuum/discard already took it
            if not os.listdir(root):
                os.rmdir(root)
    for name in os.listdir(_mdir(base)):
        if name.startswith("v") and name.endswith(".json"):
            if int(name[1:-5]) not in kept_versions:
                os.unlink(os.path.join(_mdir(base), name))
    return removed
