"""J6 — per-object linked-list ordering inside a jet drop.

Within one (pulse, jet) group, each object's state records form a
linked list via prev_record_reference; the transform must emit them in
chain order and assign the drop-wide `order` column. A broken or forked
chain invalidates the whole jet drop (the reference fails the drop's
transform and retries — etl/transformer/transformer.go:87-152, pinned
by test/api/object_lifeline_test.go:158-223).

Spark shape: groupBy(pulse_number, jet_id).applyInPandas — groups are
one jet drop (≤ a few thousand rows), so a per-group hash-map walk in
Python is both exact and cheap, while the grouping itself (the actual
scale problem: billions of records → millions of drops) stays a single
Spark shuffle. Arrow moves each group as a columnar batch.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from block_explorer_spark import schemas


class BrokenChainError(ValueError):
    """A state chain inside one jet drop is broken or forked."""


def order_group(records: list[dict]) -> list[dict]:
    """Chain-sort one jet drop's records (pure Python, unit-testable).

    Records arrive in extractor `position` order. Non-state records keep
    positional order. State records are re-ordered per object by walking
    prev_record_reference chains from the head (the record whose prev is
    absent from the group); fork (two records sharing a prev) or break
    (missing link / cycle) raises BrokenChainError for the whole drop.

    Output: the full record list with `order` = 1..N assigned in final
    sequence: positional order, but each object's state records replaced
    by chain order.
    """
    by_pos = sorted(records, key=lambda r: r["position"])
    states: dict[bytes, list[dict]] = {}
    for r in by_pos:
        if r["type"] == "state":
            states.setdefault(bytes(r["object_reference"] or b""), []).append(r)

    chain_order: dict[bytes, list[dict]] = {}
    for obj, group in states.items():
        refs = {bytes(r["reference"]): r for r in group}
        prevs = [
            bytes(r["prev_record_reference"]) if r["prev_record_reference"] else None
            for r in group
        ]
        non_null_prevs = [p for p in prevs if p is not None]
        if len(set(non_null_prevs)) != len(non_null_prevs):
            raise BrokenChainError(f"forked chain for object {obj.hex()}")
        heads = [
            r
            for r, p in zip(group, prevs)
            if p is None or p not in refs
        ]
        if len(heads) != 1:
            raise BrokenChainError(
                f"object {obj.hex()}: {len(heads)} chain heads in drop (want 1)"
            )
        nxt = {
            p: r for r, p in zip(group, prevs) if p is not None and p in refs
        }
        ordered = [heads[0]]
        while len(ordered) < len(group):
            cur = bytes(ordered[-1]["reference"])
            if cur not in nxt:
                raise BrokenChainError(f"broken chain for object {obj.hex()}")
            ordered.append(nxt[cur])
        chain_order[obj] = ordered

    iters: dict[bytes, Iterable[dict]] = {k: iter(v) for k, v in chain_order.items()}
    out = []
    for r in by_pos:
        if r["type"] == "state":
            r = next(iters[bytes(r["object_reference"] or b"")])
        out.append(dict(r))
    for i, r in enumerate(out):
        r["order"] = i + 1
    return out


def make_sort_group(dedupe: bool):
    """The per-(pulse, jet) group transform, as one pandas→pandas
    function. Module-level so BOTH execution paths — the cluster
    `applyInPandas` below and the driver-side micro-batch transform
    (plans/transformer.transform_pulse_data_pdf) — run the identical
    code object; path equivalence is by construction, not by parallel
    implementation."""

    def sort_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if dedupe:
            pdf = pdf.drop_duplicates()
        rows = pdf.to_dict("records")
        try:
            ordered = order_group(rows)
            err = None
        except BrokenChainError as e:
            ordered = []
            for i, r in enumerate(sorted(rows, key=lambda r: r["position"])):
                r = dict(r)
                r["order"] = i + 1
                ordered.append(r)
            err = str(e)
        res = pd.DataFrame(ordered)
        res = res.drop(columns=["position"])
        res["chain_error"] = err
        return res

    return sort_group


def chain_sort_drops(
    decoded: DataFrame, drop_invalid: bool = True, dedupe: bool = False
) -> DataFrame:
    """Assign `order` per (pulse_number, jet_id) via the J6 chain sort.

    Input: decoded records (schemas.RECORDS minus `order`, plus
    `position`). Output: schemas.RECORDS. Invalid drops (broken/forked
    chains) are dropped when drop_invalid=True — matching the
    reference's fail-the-whole-drop semantics; the controller's reload
    loop (D6) re-requests them later.

    dedupe=True collapses byte-identical rows INSIDE each group before
    the chain walk (r11): an at-least-once source's exact replays share
    every column incl. (pulse, jet), so they always land in the same
    group, and the in-group pandas dedup rides the grouping shuffle the
    sort already pays — the caller saves the standalone
    `dropDuplicates()` exchange over the full batch (guide §2.4). Rows
    differing in ANY column (a genuine in-batch fork) still reach fork
    validation exactly as before.
    """
    out_schema = T.StructType(
        [f for f in schemas.RECORDS.fields] + [T.StructField("chain_error", T.StringType(), True)]
    )
    in_cols = [f.name for f in schemas.RECORDS.fields if f.name != "order"] + ["position"]

    sort_group = make_sort_group(dedupe)

    sorted_df = (
        decoded.select(*in_cols, F.lit(0).alias("order"))
        .groupBy("pulse_number", "jet_id")
        .applyInPandas(sort_group, schema=out_schema)
    )
    if drop_invalid:
        sorted_df = sorted_df.filter(F.col("chain_error").isNull())
    return sorted_df.drop("chain_error")
