"""The 11-operator public query surface (SURVEY §2.12) as DataFrame plans.

Each function mirrors one StorageAPIFetcher operation
(reference: etl/interfaces/interfaces.go:102-123, etl/storage/storage.go)
as a pure DataFrame composition: validation stays at the API edge,
semantics (sentinels, ordering, pagination, sibling/hierarchy lookups)
live here, and Catalyst handles pushdown/pruning/join strategy.

Paged operations return (page_df, total) — the reference's two-pass
LIMIT + COUNT(*) pattern (A1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from block_explorer_spark.functions import jets
from block_explorer_spark.operators import filters as Fl
from block_explorer_spark.operators import joins as J
from block_explorer_spark.operators import pagination as Pg
from block_explorer_spark.operators import windows as W


# ---------------------------------------------------------------------------
# records
# ---------------------------------------------------------------------------


def get_lifeline(
    records: DataFrame,
    object_reference: bytes,
    cursor: tuple[int, int] | None = None,
    pulse_gt: int | None = None,
    pulse_lt: int | None = None,
    ts_gte: int | None = None,
    ts_lte: int | None = None,
    ascending: bool = False,
    limit: int = Pg.DEFAULT_LIMIT,
    offset: int = 0,
) -> tuple[DataFrame, int]:
    """GET /api/v1/lifeline/{ref}/records — an object's state history.

    F5 (object equality + type='state') + F1 pulse range + F3 timestamp
    range + F4 keyset cursor + (pulse_number, order) sort + page/total.
    reference: etl/storage/storage.go:258-283
    """
    df = Fl.apply_filters(
        records,
        Fl.equality(type="state") & (F.col("object_reference") == object_reference),
        Fl.range_exclusive("pulse_number", gt=pulse_gt, lt=pulse_lt),
        Fl.timestamp_range(gte=ts_gte, lte=ts_lte),
        Fl.keyset_cursor("pulse_number", "order", cursor[0], cursor[1], ascending)
        if cursor is not None
        else None,
    )
    sort = [("pulse_number", ascending), ("order", ascending)]
    return Pg.paginate_with_total(df, sort, limit, offset)


def get_records_by_jet_drop(
    records: DataFrame,
    jet_id: str,
    pulse_number: int,
    record_type: str | None = None,
    cursor: tuple[int, int] | None = None,
    ascending: bool = True,
    limit: int = Pg.DEFAULT_LIMIT,
    offset: int = 0,
) -> tuple[DataFrame, int]:
    """GET /api/v1/jet-drops/{id}/records.

    F6 point + optional F7 type + F4 cursor + W1 sort + page/total.
    reference: etl/storage/storage.go:382-407
    """
    df = Fl.apply_filters(
        records,
        Fl.equality(jet_id=jet_id, pulse_number=pulse_number),
        Fl.equality(type=record_type) if record_type else None,
        Fl.keyset_cursor("pulse_number", "order", cursor[0], cursor[1], ascending)
        if cursor is not None
        else None,
    )
    sort = [("pulse_number", ascending), ("order", ascending)]
    return Pg.paginate_with_total(df, sort, limit, offset)


def get_record(records: DataFrame, reference: bytes) -> DataFrame:
    """Point lookup by record reference (search dispatch target)."""
    return records.filter(F.col("reference") == reference)


# ---------------------------------------------------------------------------
# pulses
# ---------------------------------------------------------------------------


def get_pulse(pulses: DataFrame, pulse_number: int) -> DataFrame:
    """GET /api/v1/pulses/{pn} — point lookup + J2 prev/next repair.

    A pulse's stored next link is nominal; the API must report -1 when
    the neighbor it names was never saved. Resolved with one self-join
    against the (broadcast) single-row probe.
    reference: etl/storage/storage.go:286-300,360-379
    """
    point = pulses.filter(F.col("pulse_number") == pulse_number)
    others = pulses.select(
        F.col("pulse_number").alias("__pn"), F.col("prev_pulse_number").alias("__prev")
    )
    with_next = (
        F.broadcast(point)
        .join(others, on=F.col("pulse_number") == F.col("__prev"), how="left_outer")
        .withColumn("next_pulse_number", F.coalesce(F.col("__pn"), F.lit(W.MISSING)))
        .drop("__pn", "__prev")
    )
    prev_exists = pulses.select(F.col("pulse_number").alias("__prev_pn"))
    return (
        F.broadcast(with_next)
        .join(prev_exists, on=F.col("prev_pulse_number") == F.col("__prev_pn"), how="left_outer")
        .withColumn(
            "prev_pulse_number",
            F.when(F.col("__prev_pn").isNull(), F.lit(W.MISSING)).otherwise(
                F.col("prev_pulse_number")
            ),
        )
        .drop("__prev_pn")
    )


def get_pulses(
    pulses: DataFrame,
    from_pulse: int | None = None,
    ts_gte: int | None = None,
    ts_lte: int | None = None,
    pulse_gt: int | None = None,
    pulse_gte: int | None = None,
    pulse_lt: int | None = None,
    pulse_lte: int | None = None,
    ascending: bool = False,
    limit: int = Pg.DEFAULT_LIMIT,
    offset: int = 0,
    lazy_total: bool = False,
) -> tuple[DataFrame, int | None]:
    """GET /api/v1/pulses — filtered page with W2 chain repair.

    F2 4-way pulse range + F3 timestamp range + `pulse_number <= from`
    + sort + page/total, then adjacent-row repair of prev/next links
    *within the page* (the reference repairs the fetched slice:
    etl/storage/storage.go:303-358).

    `lazy_total=True` is the serving hot path: instead of a separate
    count ACTION (a full extra Spark job per request — the dominant
    cost at point-serving latencies), the total rides along as a
    `__total` window column over the filtered set and the function
    returns (page, None); the caller reads it from the collected rows.
    The empty-frame window is a single partition of the FILTERED pulse
    dim — bounded by construction (one row per ~10 s pulse), the same
    bounded-window argument as budget_select's bucket prefix.
    """
    df = Fl.apply_filters(
        pulses,
        Fl.range_4way("pulse_number", gt=pulse_gt, gte=pulse_gte, lt=pulse_lt, lte=pulse_lte),
        Fl.timestamp_range(gte=ts_gte, lte=ts_lte),
        (F.col("pulse_number") <= from_pulse) if from_pulse is not None else None,
    )
    if lazy_total:
        total = None
        df = df.withColumn("__total", F.count(F.lit(1)).over(Window.partitionBy()))
    else:
        total = df.count()
    page = Pg.paginate(df, [("pulse_number", ascending)], limit, offset)
    # Interior rows repair against page-adjacent rows only (the
    # reference's vectorized walk is page-local, storage.go:326-357);
    # page is small (≤1000) so the window sort is trivial.
    orig_prev = F.col("__orig_prev")
    repaired = W.chain_repair(
        page.withColumn("__orig_prev", F.col("prev_pulse_number")),
        window=Window.orderBy("pulse_number"),
    )
    # Page-EDGE rows consult the full table like the reference's
    # updatePrevPulse/updateNextPulse (storage.go:360-379): the lowest
    # row keeps its stored prev iff that pulse exists anywhere; the
    # highest row's next is the pulse whose prev-link names it. All
    # probe sides are tiny (1-row aggregates / ≤1000 distinct keys) →
    # broadcast; the pulses scans they prune are small by nature
    # (one row per ~10 s pulse).
    lo_hi = page.agg(F.min("pulse_number").alias("__lo"), F.max("pulse_number").alias("__hi"))
    next_real = (
        pulses.crossJoin(F.broadcast(lo_hi))
        .filter(F.col("prev_pulse_number") == F.col("__hi"))
        .agg(F.min("pulse_number").alias("__next_real"))
    )
    prev_keys = page.select(F.col("prev_pulse_number").alias("__pe")).distinct()
    prev_exists = pulses.join(
        F.broadcast(prev_keys), F.col("pulse_number") == F.col("__pe"), "left_semi"
    ).select(F.col("pulse_number").alias("__pe"))
    out = (
        repaired.crossJoin(F.broadcast(lo_hi))
        .crossJoin(F.broadcast(next_real))
        .join(F.broadcast(prev_exists), orig_prev == F.col("__pe"), "left_outer")
        .withColumn(
            "next_pulse_number",
            F.when(
                F.col("pulse_number") == F.col("__hi"),
                F.coalesce(F.col("__next_real"), F.lit(W.MISSING)),
            ).otherwise(F.col("next_pulse_number")),
        )
        .withColumn(
            "prev_pulse_number",
            F.when(
                F.col("pulse_number") == F.col("__lo"),
                F.when(F.col("__pe").isNull(), F.lit(W.MISSING)).otherwise(orig_prev),
            ).otherwise(F.col("prev_pulse_number")),
        )
        .drop("__orig_prev", "__lo", "__hi", "__next_real", "__pe")
    )
    return out.orderBy(
        F.col("pulse_number").asc() if ascending else F.col("pulse_number").desc()
    ), total


def get_pulses_rows(
    pulses: DataFrame,
    from_pulse: int | None = None,
    ts_gte: int | None = None,
    ts_lte: int | None = None,
    pulse_gt: int | None = None,
    pulse_gte: int | None = None,
    pulse_lt: int | None = None,
    pulse_lte: int | None = None,
    ascending: bool = False,
    limit: int = Pg.DEFAULT_LIMIT,
    offset: int = 0,
) -> tuple[list[dict], int]:
    """Serving fast path for GET /api/v1/pulses: collect the plain
    filtered page (ONE simple Spark job, total fused as a window
    column), then do the W2 chain repair driver-side over the <=1000
    collected rows, plus ONE tiny aggregate for the page-edge probes.

    This is the REFERENCE'S OWN architecture — it fetches the slice
    from storage and repairs prev/next links imperatively in Go
    (etl/storage/storage.go:326-357, api edge fixes 360-379). The
    declarative form (get_pulses) remains the batch/analytics path;
    at point-serving latencies its per-request plan construction and
    three broadcast subqueries dominate wall time (measured ~700 ms
    vs ~250 ms for this form on the loadtest shape), while the repair
    itself is O(page) row logic either way.

    Returns (rows sorted per `ascending` with repaired links, total).
    Row dicts carry the raw pulse columns (no API mapping)."""
    df = Fl.apply_filters(
        pulses,
        Fl.range_4way("pulse_number", gt=pulse_gt, gte=pulse_gte, lt=pulse_lt, lte=pulse_lte),
        Fl.timestamp_range(gte=ts_gte, lte=ts_lte),
        (F.col("pulse_number") <= from_pulse) if from_pulse is not None else None,
    )
    df = df.withColumn("__total", F.count(F.lit(1)).over(Window.partitionBy()))
    page = Pg.paginate(df, [("pulse_number", ascending)], limit, offset)
    rows = [r.asDict() for r in page.collect()]
    if not rows:
        return [], df.drop("__total").count()
    total = rows[0]["__total"]
    for r in rows:
        r.pop("__total", None)

    rows.sort(key=lambda r: r["pulse_number"])
    orig_prev = [r["prev_pulse_number"] for r in rows]
    n = len(rows)
    # W2 interior repair (storage.go:326-357): prev keyed on the lag
    # row, next OVERWRITTEN from the lead row iff its prev points back
    for i, r in enumerate(rows):
        lag_key = rows[i - 1]["pulse_number"] if i > 0 else None
        r["prev_pulse_number"] = (
            orig_prev[i] if lag_key is not None and lag_key == orig_prev[i] else W.MISSING
        )
        lead_prev = orig_prev[i + 1] if i + 1 < n else None
        r["next_pulse_number"] = (
            rows[i + 1]["pulse_number"]
            if lead_prev is not None and lead_prev == r["pulse_number"]
            else W.MISSING
        )
    # Page-edge fixes consult the full table (storage.go:360-379):
    # one combined aggregate — next-real for the highest row, prev
    # existence for the lowest row's stored link.
    lo_prev = orig_prev[0]
    hi = rows[-1]["pulse_number"]
    edge = pulses.agg(
        F.min(
            F.when(F.col("prev_pulse_number") == F.lit(hi), F.col("pulse_number"))
        ).alias("__next_real"),
        F.max(
            F.when(F.col("pulse_number") == F.lit(lo_prev), F.lit(1))
        ).alias("__prev_exists"),
    ).collect()[0]
    rows[-1]["next_pulse_number"] = (
        edge["__next_real"] if edge["__next_real"] is not None else W.MISSING
    )
    rows[0]["prev_pulse_number"] = (
        lo_prev if edge["__prev_exists"] is not None else W.MISSING
    )
    if not ascending:
        rows.reverse()
    return rows, total


def get_incomplete_pulses(pulses: DataFrame) -> DataFrame:
    """F10: WHERE NOT is_complete. reference: etl/storage/storage.go:410-417"""
    return pulses.filter(~F.col("is_complete"))


def get_sequential_pulse(pulses: DataFrame) -> DataFrame:
    """A4: latest sequential pulse. reference: etl/storage/storage.go:430-443"""
    return Pg.top1(pulses.filter(F.col("is_sequential")), [("pulse_number", False)])


def get_next_saved_pulse(
    pulses: DataFrame, after: int, complete_only: bool = False
) -> DataFrame:
    """A5: first pulse after `after`. reference: etl/storage/storage.go:446-463"""
    df = pulses.filter(F.col("pulse_number") > after)
    if complete_only:
        df = df.filter(F.col("is_complete"))
    return Pg.top1(df, [("pulse_number", True)])


def get_pulse_by_prev(pulses: DataFrame, prev_pulse_number: int) -> DataFrame:
    """F11: pulse whose prev link = given. reference: etl/storage/storage.go:420-428"""
    return pulses.filter(F.col("prev_pulse_number") == prev_pulse_number)


def next_complete_pulse_with_prototypes(
    pulses: DataFrame, records: DataFrame, prev_pulse_number: int, prototypes: list[bytes]
) -> DataFrame:
    """Exporter J1: next complete pulse + its prototype-matched record count.

    Returns (pulse_number, prev_pulse_number, record_amount) where
    record_amount is the *matched* count (A6 overwrite semantics).
    reference: etl/storage/storage.go:563-585
    """
    joined = J.records_for_pulse_with_prototypes(pulses, records, prev_pulse_number, prototypes)
    return joined.groupBy("pulse_number", "prev_pulse_number").agg(
        F.count(F.lit(1)).alias("record_amount")
    )


# ---------------------------------------------------------------------------
# jet drops
# ---------------------------------------------------------------------------


def get_jet_drops_by_pulse(
    jet_drops: DataFrame,
    pulse_number: int,
    from_jet_id: str | None = None,
    limit: int = Pg.DEFAULT_LIMIT,
    offset: int = 0,
) -> tuple[DataFrame, int]:
    """GET /api/v1/pulses/{pn}/jet-drops.

    F6 pulse point + `jet_id >= from` seek + ORDER BY jet_id + page.
    reference: etl/storage/storage.go:475-494
    """
    df = Fl.apply_filters(
        jet_drops,
        Fl.equality(pulse_number=pulse_number),
        (F.col("jet_id") >= from_jet_id) if from_jet_id is not None else None,
    )
    return Pg.paginate_with_total(df, [("jet_id", True)], limit, offset)


def get_jet_drop_by_id(
    jet_drops: DataFrame, jet_id: str, pulse_number: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """GET /api/v1/jet-drops/{id} — point + J3 sibling prev/next drops.

    Returns (drop, prev_drops, next_drops): siblings limited to the
    adjacent pulses actually holding them (the reference resolves prev/
    next pulse first, then sibling-filters; we push both predicates into
    one scan each way and keep only the nearest pulse's matches).
    reference: etl/storage/storage.go:496-531
    """
    drop = jet_drops.filter(Fl.equality(jet_id=jet_id, pulse_number=pulse_number))
    sib = jets.sibling_exprs(jet_id)

    # Nearest sibling-holding pulse each way via a scalar aggregate
    # (map-side partial max/min + 1-row broadcast), NOT a global
    # window: the sibling filter can match one drop per pulse, and a
    # dense_rank over an unpartitioned window would single-partition
    # that entire history at scale.
    def _nearest(direction_lt: bool) -> DataFrame:
        cond = F.col("pulse_number") < pulse_number if direction_lt else (
            F.col("pulse_number") > pulse_number
        )
        cand = jet_drops.filter(Fl.in_list("jet_id", sib) & cond)
        edge = cand.agg(
            (F.max if direction_lt else F.min)("pulse_number").alias("__edge")
        )
        return (
            cand.crossJoin(F.broadcast(edge))
            .filter(F.col("pulse_number") == F.col("__edge"))
            .drop("__edge")
        )

    return drop, _nearest(True), _nearest(False)


def get_jet_drop_by_id_rows(
    jet_drops: DataFrame, jet_id: str, pulse_number: int
) -> tuple[list[dict], list[dict], list[dict]]:
    """Serving fast path for GET /api/v1/jet-drops/{id}: the same
    (drop, prev siblings, next siblings) answer as get_jet_drop_by_id
    in ONE collect — one sibling-filtered scan, the two nearest-pulse
    edges fused in as a broadcast scalar, rows classified driver-side.
    The declarative triple stays for batch callers; per-request this
    replaces three collects (each with its own broadcast subquery)
    with a single bounded job."""
    sib = jets.sibling_exprs(jet_id)
    cand = jet_drops.filter(Fl.in_list("jet_id", sib))
    edges = cand.agg(
        F.max(
            F.when(F.col("pulse_number") < pulse_number, F.col("pulse_number"))
        ).alias("__prev"),
        F.min(
            F.when(F.col("pulse_number") > pulse_number, F.col("pulse_number"))
        ).alias("__next"),
    )
    rows = [
        r.asDict()
        for r in cand.crossJoin(F.broadcast(edges))
        .filter(
            (F.col("pulse_number") == F.lit(pulse_number))
            | (F.col("pulse_number") == F.col("__prev"))
            | (F.col("pulse_number") == F.col("__next"))
        )
        .collect()
    ]
    drop = [
        r for r in rows
        if r["pulse_number"] == pulse_number and r["jet_id"] == jet_id
    ]
    prev = [r for r in rows if r["pulse_number"] == r["__prev"]]
    nxt = [r for r in rows if r["pulse_number"] == r["__next"]]
    for r in rows:
        r.pop("__prev", None)
        r.pop("__next", None)
    return drop, prev, nxt


def get_jet_drops_by_jet_id(
    jet_drops: DataFrame,
    jet_id: str,
    pulse_gt: int | None = None,
    pulse_gte: int | None = None,
    pulse_lt: int | None = None,
    pulse_lte: int | None = None,
    pulse_ascending: bool = False,
    limit: int = 1000,
    lazy_total: bool = False,
) -> tuple[DataFrame, int | None]:
    """GET /api/v1/jets/{id}/jet-drops — hierarchy page.

    F9 (jet + ancestors + descendants) + F2 pulse range + two-column
    sort with opposing directions (pulse asc ⇒ jet desc and vice versa)
    + LIMIT (no offset on this endpoint) + total.
    reference: etl/storage/storage.go:533-561

    `lazy_total=True`: total rides along as a `__total` window column
    instead of a second count job (see get_pulses); the filtered set
    is one jet's hierarchy slice — bounded."""
    df = Fl.apply_filters(
        jet_drops,
        Fl.jet_hierarchy(jet_id, jets.jet_parents(jet_id)[:-1]),
        Fl.range_4way("pulse_number", gt=pulse_gt, gte=pulse_gte, lt=pulse_lt, lte=pulse_lte),
    )
    sort = [("pulse_number", pulse_ascending), ("jet_id", not pulse_ascending)]
    if lazy_total:
        df = df.withColumn("__total", F.count(F.lit(1)).over(Window.partitionBy()))
        return Pg.paginate(df, sort, limit, 0), None
    page = Pg.paginate(df, sort, limit, 0)
    return page, df.count()


def enrich_with_hash_chain(
    page: DataFrame,
    jet_drops: DataFrame,
    prev_pulse: int | None,
    next_pulse: int | None,
) -> DataFrame:
    """J5 + J4: adjacency prefetch then hash-chain prev/next edges.

    reference: api/handlers.go:150-297
    """
    enriched = J.adjacency_enrich(page, jet_drops, prev_pulse, next_pulse)
    return J.hash_chain_edges(enriched)


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------


def search(
    pulses: DataFrame,
    jet_drops: DataFrame,
    records: DataFrame,
    value: str,
) -> tuple[str, DataFrame]:
    """GET /api/v1/search?value= — type-dispatch point lookup.

    pulse int → pulse; "<jet>:<pulse>" → jet drop; base58 ref → record
    (by reference) or lifeline head (by object_reference).
    reference: api/handlers.go:458-553
    """
    from block_explorer_spark.functions import refs

    v = value.strip()
    if v.isdigit():
        return "pulse", get_pulse(pulses, int(v))
    if ":" in v:
        jet, pn = jets.parse_jet_drop_id(v)
        drop, _, _ = get_jet_drop_by_id(jet_drops, jet, pn)
        return "jet_drop", drop
    ref = refs.parse_reference(v)
    # The reference classifies the base58 ref structurally
    # (IsObjectReference); observable behavior: object refs answer as
    # a lifeline, record refs as the record (+index). Classified here
    # by data — object match wins, matching searchReferencePulse's
    # response order (api/handlers.go:515-553).
    as_object = records.filter(F.col("object_reference") == ref)
    if not as_object.isEmpty():
        return "lifeline", as_object
    return "record", records.filter(F.col("reference") == ref)
