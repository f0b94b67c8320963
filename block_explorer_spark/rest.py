"""Thin HTTP facade over the 8-endpoint public query surface.

The reference serves its storage API behind echo HTTP handlers
(api/handlers.go) whose observable contract — URL shapes, status
codes, the CodeValidationError body with its per-endpoint quirks, the
response envelopes — is pinned by api/handlers_test.go. This module
reproduces that wire contract with the stdlib ThreadingHTTPServer:
routing + JSON rendering only. All validation lives in api.py and all
query semantics in plans/queries.py; a request collects at most one
page (<= MAX_LIMIT rows), so serving is driver-edge work by design.

Endpoint -> handler parity map (reference api/handlers.go):
  GET /api/v1/pulses                         Pulses            :311
  GET /api/v1/pulses/{pulse}                 Pulse             :389
  GET /api/v1/pulses/{pulse}/jet-drops       JetDropsByPulse   :404
  GET /api/v1/jet-drops/{id}                 JetDropByID       :45
  GET /api/v1/jet-drops/{id}/records         JetDropRecords    :83
  GET /api/v1/jets/{jet_id}/jet-drops        JetDropsByJetID   :150
  GET /api/v1/lifeline/{ref}/records         ObjectLifeline    :555
  GET /api/v1/search                         Search            :458

Body-shape quirks preserved (handlers.go):
  - most 400s: {"code": "Bad Request", "message": ..., "validation_failures": [...]}
  - JetDropByID / JetDropsByPulseNumber use code "400" (strconv.Itoa,
    handlers.go:49,424) instead of the status text;
  - Search renders the message under "description" (handlers.go:482-488);
  - 404 and 500 bodies are the empty object {}.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from block_explorer_spark import api
from block_explorer_spark.functions import jets
from block_explorer_spark.functions.refs import base58_encode
from block_explorer_spark.metrics import MetricsRegistry
from block_explorer_spark.plans import queries as Q

INVALID_PARAMS_MESSAGE = "Invalid query or path parameters"  # handlers.go:28

_INT_RE = re.compile(r"^-?[0-9]+$")


class HttpError(Exception):
    def __init__(self, status: int, body: dict):
        self.status = status
        self.body = body
        super().__init__(f"HTTP {status}")


def _validation_error(
    failures: list[api.ValidationFailure],
    code: str = "Bad Request",
    message_field: str = "message",
) -> HttpError:
    return HttpError(
        400,
        {
            "code": code,
            message_field: INVALID_PARAMS_MESSAGE,
            "validation_failures": [
                {"property": f.property, "failure_reason": f.failure_reason} for f in failures
            ],
        },
    )


def _int_param(params: dict, name: str, failures: list) -> int | None:
    """Parse an integer query param; a non-integer value is the echo
    binding failure (HTTP 400) the reference produces before the
    handler runs (spec types the param int64)."""
    if name not in params:
        return None
    raw = params[name][0]
    if not _INT_RE.match(raw):
        failures.append(api.ValidationFailure(name, "invalid value"))
        return None
    return int(raw)


def _strip_none(d: dict) -> dict:
    """omitempty: the generated Go models drop nil pointer fields."""
    return {k: v for k, v in d.items() if v is not None}


class BlockExplorerApi:
    """Transport-free endpoint logic: dict params in, (status, body) out.

    Holds the three core DataFrames (normally cached); every public
    method mirrors one reference handler including its failure-
    accumulation order.
    """

    def __init__(
        self,
        pulses: DataFrame,
        jet_drops: DataFrame,
        records: DataFrame,
        warehouse_base: str | None = None,
        spark=None,
    ):
        self.pulses = pulses
        self.jet_drops = jet_drops
        self.records = records
        # WAREHOUSE MODE (round 8): at test scale the three cached
        # DataFrames are the fastest serving store, but at 100 TB the
        # records table cannot be cached — pass `warehouse_base` (+
        # its SparkSession) and the lifeline endpoint reads through
        # sources/parquet.read_records_for_object instead: manifest
        # snapshot + object-index sidecar + obj_key zone pruning, the
        # flat-latency path SCALE_RELATIONAL measures. Results are
        # byte-identical to the cached mode (pinned by
        # test_rest_golden::test_lifeline_warehouse_mode_identical).
        self.warehouse_base = warehouse_base
        self.spark = spark
        # SEARCH MODE (round-8 continuation): pass a committed
        # postings-index base (retrieval.write_postings_index — with
        # positions=True for the phrase/context endpoints) and the
        # documents DataFrame to serve /api/v1/search/* — keyword BM25
        # from the index (auto full-vs-MaxScore policy), exact-phrase
        # hits from the positional family, and KWIC context windows.
        # Unconfigured, those routes answer 404 like any unknown path.
        self.search_index: str | None = None
        self.search_docs: DataFrame | None = None
        # Continuous per-endpoint timers, observed on EVERY request by
        # the HTTP handler (reference parity: the Prometheus timers of
        # etl/storage/storage_metrics.go:1-125 run in normal operation,
        # not only under bench). Served at /metrics (+ /metrics.json).
        self.metrics = MetricsRegistry()

    # -- rendering -----------------------------------------------------

    def _render_records(self, page: DataFrame, total: int) -> dict:
        rows = api.render_refs([r.asDict() for r in api.records_to_api(page).collect()])
        return {"total": total, "result": [_strip_none(r) for r in rows]}

    def _render_pulses(self, page: DataFrame, total: int) -> dict:
        rows = [r.asDict() for r in api.pulses_to_api(page).collect()]
        return {"total": total, "result": [_strip_none(r) for r in rows]}

    @staticmethod
    def _prev_next_entry(row) -> dict:
        """transformPrevNextResp (api/handlers.go:785-793)."""
        return {
            "jet_id": jets.storage_to_display(row["jet_id"]),
            "jet_drop_id": f"{jets.storage_to_display(row['jet_id'])}:{row['pulse_number']}",
            "pulse_number": row["pulse_number"],
        }

    def _render_drop(self, row: dict, prev: list[dict], nxt: list[dict]) -> dict:
        rendered = _strip_none(row)
        rendered["prev_jet_drop_id"] = prev
        rendered["next_jet_drop_id"] = nxt
        return rendered

    # -- warmup --------------------------------------------------------

    def warmup(self) -> int:
        """One dry request per endpoint (round-6 item 5): builds and
        executes every endpoint's plan once so real traffic never pays
        Catalyst construction + codegen JIT on its first hit. Params
        come from a sample row of each table when one exists (the dry
        run then walks the same join/window shapes as a hit); on an
        empty store the miss path still warms the scan plans. Failures
        are swallowed — warmup must never block serving. Returns the
        number of endpoints warmed."""
        from block_explorer_spark.functions import jets as _jets
        from block_explorer_spark.functions.refs import base58_encode

        prow = self.pulses.limit(1).collect()
        drow = self.jet_drops.limit(1).collect()
        rrow = self.records.limit(1).collect()
        pn = str(prow[0]["pulse_number"]) if prow else "65537"
        if drow:
            jet_disp = _jets.storage_to_display(drow[0]["jet_id"])
            drop_pn = drow[0]["pulse_number"]
        else:
            jet_disp, drop_pn = "*", 65537
        drop_id = f"{jet_disp}:{drop_pn}"
        ref = base58_encode(
            bytes(rrow[0]["object_reference"]) if rrow and rrow[0]["object_reference"]
            else b"\x01" * 32
        )
        # params are parse_qs-shaped: every value is a list
        calls = [
            lambda: self.pulses_list({"limit": ["20"]}),
            lambda: self.pulse_by_number(pn),
            lambda: self.jet_drops_by_pulse(str(drop_pn), {"limit": ["20"]}),
            lambda: self.jet_drop_by_id(drop_id),
            lambda: self.jet_drops_by_jet_id(jet_disp, {"limit": ["20"]}),
            lambda: self.jet_drop_records(drop_id, {"limit": ["20"]}),
            lambda: self.object_lifeline(ref, {"limit": ["20"]}),
            lambda: self.search({"value": [ref]}),
        ]
        if self.search_index is not None:
            calls += [
                lambda: self.search_documents({"query": ["warm"]}),
                lambda: self.search_phrase({"phrase": ["warm up"]}),
                lambda: self.search_context({"term": ["warm"]}),
            ]
        warmed = 0
        for call in calls:
            try:
                call()
                warmed += 1
            except HttpError:
                warmed += 1  # 4xx/miss path: the plans still executed
            except Exception:  # noqa: BLE001 - warmup is best-effort
                pass
        return warmed

    # -- endpoints -----------------------------------------------------

    def object_lifeline(self, ref_path: str, params: dict) -> tuple[int, dict]:
        """reference: api/handlers.go:555-646"""
        limit, offset, failures = api.check_limit_offset(
            int(params["limit"][0]) if "limit" in params and _INT_RE.match(params["limit"][0]) else None,
            int(params["offset"][0]) if "offset" in params and _INT_RE.match(params["offset"][0]) else None,
        )
        ref = None
        try:
            ref = api.check_reference(unquote(ref_path))
        except api.ValidationError as e:
            failures.append(
                api.ValidationFailure("object_reference", e.failures[0].failure_reason)
            )
        ascending, sort_failures = api.check_sort_by_index(
            params["sort_by"][0] if "sort_by" in params else None
        )
        failures += sort_failures
        cursor = None
        if "from_index" in params:
            try:
                cursor = api.check_from_index(params["from_index"][0])
            except ValueError:
                failures.append(api.ValidationFailure("from_index", "invalid"))
        pulse_gt = _int_param(params, "pulse_number_gt", [])
        if pulse_gt is not None:
            failures += api.check_pulse_number(pulse_gt, "pulse_number_gt")
        pulse_lt = _int_param(params, "pulse_number_lt", [])
        if pulse_lt is not None:
            failures += api.check_pulse_number(pulse_lt, "pulse_number_lt")
        if failures:
            raise _validation_error(failures)
        ts_gte = _int_param(params, "timestamp_gte", [])
        ts_lte = _int_param(params, "timestamp_lte", [])
        source = self.records
        if self.warehouse_base is not None:
            from block_explorer_spark.sources import parquet as _pq

            # exclusive API bounds -> inclusive file-pruning bounds
            source = _pq.read_records_for_object(
                self.spark,
                self.warehouse_base,
                ref,
                pulse_gte=pulse_gt + 1 if pulse_gt is not None else None,
                pulse_lte=pulse_lt - 1 if pulse_lt is not None else None,
            )
        page, total = Q.get_lifeline(
            source,
            ref,
            cursor=cursor,
            pulse_gt=pulse_gt,
            pulse_lt=pulse_lt,
            ts_gte=ts_gte,
            ts_lte=ts_lte,
            ascending=ascending,
            limit=limit,
            offset=offset,
        )
        return 200, self._render_records(page, total)

    def jet_drop_records(self, jet_drop_id: str, params: dict) -> tuple[int, dict]:
        """reference: api/handlers.go:83-148"""
        limit, offset, failures = api.check_limit_offset(
            int(params["limit"][0]) if "limit" in params and _INT_RE.match(params["limit"][0]) else None,
            int(params["offset"][0]) if "offset" in params and _INT_RE.match(params["offset"][0]) else None,
        )
        jet_id = pulse_number = None
        try:
            jet_id, pulse_number = jets.parse_jet_drop_id(jet_drop_id)
        except ValueError:
            failures.append(api.ValidationFailure("jet_drop_id", "invalid"))
        cursor = None
        if "from_index" in params:
            try:
                cursor = api.check_from_index(params["from_index"][0])
            except ValueError:
                failures.append(api.ValidationFailure("from_index", "invalid"))
        record_type, type_failures = api.check_record_type(
            params["type"][0] if "type" in params else None
        )
        failures += type_failures
        if failures:
            raise _validation_error(failures)
        page, total = Q.get_records_by_jet_drop(
            self.records,
            jet_id,
            pulse_number,
            record_type=record_type,
            cursor=cursor,
            limit=limit,
            offset=offset,
        )
        return 200, self._render_records(page, total)

    def jet_drops_by_jet_id(self, jet_id_path: str, params: dict) -> tuple[int, dict]:
        """reference: api/handlers.go:150-242 (default limit 1000 per
        the reference's own FIXME PENV-505, handlers.go:153-156)"""
        failures: list[api.ValidationFailure] = []
        if "limit" in params and _INT_RE.match(params["limit"][0]):
            limit, _, failures = api.check_limit_offset(int(params["limit"][0]), None)
        else:
            limit = 1000
        jet_id, jet_failures = api.check_jet_id(jet_id_path)
        failures += jet_failures
        ascending, sort_failures = api.check_sort_by_pulse(
            params["sort_by"][0] if "sort_by" in params else None
        )
        failures += sort_failures
        bounds = {}
        for name in ("pulse_number_gt", "pulse_number_gte", "pulse_number_lt", "pulse_number_lte"):
            v = _int_param(params, name, [])
            if v is not None:
                failures += api.check_pulse_number(v, name)
            bounds[name] = v
        if failures:
            raise _validation_error(failures)
        page, total = Q.get_jet_drops_by_jet_id(
            self.jet_drops,
            jet_id,
            pulse_gt=bounds["pulse_number_gt"],
            pulse_gte=bounds["pulse_number_gte"],
            pulse_lt=bounds["pulse_number_lt"],
            pulse_lte=bounds["pulse_number_lte"],
            pulse_ascending=ascending,
            limit=limit,
            lazy_total=True,
        )
        raw_rows = [r.asDict() for r in page.collect()]
        if not raw_rows:
            return 200, {"total": 0, "result": []}
        total = raw_rows[0]["__total"]
        # Serving fast path (the reference's own shape: fetch the
        # slice, then build createNextPrevMaps in app code,
        # api/handlers.go:207-297): the hash-chain set is the page
        # plus the two adjacent pulses' drops — all driver-sized —
        # so the enrichment joins become dict lookups over collected
        # rows. One extra Spark job fetches the adjacent drops with
        # the adjacent-pulse bounds fused in as a broadcast scalar.
        pns = [r["pulse_number"] for r in raw_rows]
        lo, hi = min(pns), max(pns)
        bounds_df = self.pulses.agg(
            F.max(F.when(F.col("pulse_number") < lo, F.col("pulse_number"))).alias("__prev"),
            F.min(F.when(F.col("pulse_number") > hi, F.col("pulse_number"))).alias("__next"),
        )
        adj_rows = [
            r.asDict()
            for r in self.jet_drops.crossJoin(F.broadcast(bounds_df))
            .filter(
                (F.col("pulse_number") == F.col("__prev"))
                | (F.col("pulse_number") == F.col("__next"))
            )
            .collect()
        ]
        # union + dropDuplicates([jet_id, pulse_number]), page first
        combined: dict[tuple, dict] = {}
        for r in raw_rows + adj_rows:
            combined.setdefault((r["jet_id"], r["pulse_number"]), r)
        # J4 hash-chain edges: parent.hash == child.first/second_prev_hash
        by_hash: dict[bytes, list[dict]] = {}
        for r in combined.values():
            if r["hash"] is not None:
                by_hash.setdefault(bytes(r["hash"]), []).append(r)
        prev_map: dict[str, list] = {}
        next_map: dict[str, list] = {}
        seen_edges: set[tuple] = set()
        for child in combined.values():
            for link in ("first_prev_hash", "second_prev_hash"):
                h = child[link]
                if h is None:
                    continue
                for parent in by_hash.get(bytes(h), []):
                    edge = (parent["jet_id"], parent["pulse_number"],
                            child["jet_id"], child["pulse_number"])
                    if edge in seen_edges:
                        continue
                    seen_edges.add(edge)
                    child_id = f"{jets.storage_to_display(child['jet_id'])}:{child['pulse_number']}"
                    parent_id = f"{jets.storage_to_display(parent['jet_id'])}:{parent['pulse_number']}"
                    prev_map.setdefault(child_id, []).append(self._prev_next_entry(parent))
                    next_map.setdefault(parent_id, []).append(self._prev_next_entry(child))
        page_rows = [api.jet_drop_row_to_api(r) for r in raw_rows]
        drops = [
            self._render_drop(
                r, prev_map.get(r["jet_drop_id"], []), next_map.get(r["jet_drop_id"], [])
            )
            for r in page_rows
        ]
        return 200, {"total": total, "result": drops}

    def _adjacent_pulses(self, lo: int, hi: int) -> tuple[int | None, int | None]:
        """Nearest saved pulses outside [lo, hi] (handlers.go:244-267)."""
        import pyspark.sql.functions as F

        row = self.pulses.agg(
            F.max(F.when(F.col("pulse_number") < lo, F.col("pulse_number"))).alias("prev"),
            F.min(F.when(F.col("pulse_number") > hi, F.col("pulse_number"))).alias("next"),
        ).collect()[0]
        return row["prev"], row["next"]

    def pulses_list(self, params: dict) -> tuple[int, dict]:
        """reference: api/handlers.go:311-388"""
        limit, offset, failures = api.check_limit_offset(
            int(params["limit"][0]) if "limit" in params and _INT_RE.match(params["limit"][0]) else None,
            int(params["offset"][0]) if "offset" in params and _INT_RE.match(params["offset"][0]) else None,
        )
        from_pulse = _int_param(params, "from_pulse_number", [])
        if from_pulse is not None and not api.is_valid_pulse_number(from_pulse):
            failures.append(api.ValidationFailure("pulse", "invalid"))
        bounds = {}
        for name in ("pulse_number_gt", "pulse_number_gte", "pulse_number_lt", "pulse_number_lte"):
            v = _int_param(params, name, [])
            if v is not None:
                failures += api.check_pulse_number(v, name)
            bounds[name] = v
        ascending, sort_failures = api.check_sort_by_pulse_number(
            params["sort_by"][0] if "sort_by" in params else None
        )
        failures += sort_failures
        if failures:
            raise _validation_error(failures)
        raw_rows, total = Q.get_pulses_rows(
            self.pulses,
            from_pulse=from_pulse,
            ts_gte=_int_param(params, "timestamp_gte", []),
            ts_lte=_int_param(params, "timestamp_lte", []),
            pulse_gt=bounds["pulse_number_gt"],
            pulse_gte=bounds["pulse_number_gte"],
            pulse_lt=bounds["pulse_number_lt"],
            pulse_lte=bounds["pulse_number_lte"],
            ascending=ascending,
            limit=limit,
            offset=offset,
        )
        rows = [api.pulse_row_to_api(r) for r in raw_rows]
        return 200, {"total": total, "result": [_strip_none(r) for r in rows]}

    def pulse_by_number(self, pulse_path: str) -> tuple[int, dict]:
        """reference: api/handlers.go:389-402 (non-integer / overflowing
        path values are echo binding failures -> 400)"""
        if not _INT_RE.match(pulse_path) or not (-(2**63) <= int(pulse_path) < 2**63):
            raise HttpError(400, {})
        rows = [r.asDict() for r in api.pulses_to_api(
            Q.get_pulse(self.pulses, int(pulse_path))
        ).collect()]
        if not rows:
            raise HttpError(404, {})
        return 200, _strip_none(rows[0])

    def jet_drops_by_pulse(self, pulse_path: str, params: dict) -> tuple[int, dict]:
        """reference: api/handlers.go:404-456 (code rendered '400')"""
        if not _INT_RE.match(pulse_path):
            raise HttpError(400, {})
        pulse_number = int(pulse_path)
        limit, offset, failures = api.check_limit_offset(
            int(params["limit"][0]) if "limit" in params and _INT_RE.match(params["limit"][0]) else None,
            int(params["offset"][0]) if "offset" in params and _INT_RE.match(params["offset"][0]) else None,
        )
        if not api.is_valid_pulse_number(pulse_number):
            failures.append(api.ValidationFailure("pulse", "invalid"))
        from_jet_id = None
        if "from_jet_drop_id" in params:
            try:
                from_jet_id, _ = jets.parse_jet_drop_id(params["from_jet_drop_id"][0])
            except ValueError:
                failures.append(api.ValidationFailure("jet drop id", "invalid"))
        if failures:
            raise _validation_error(failures, code="400")
        page, total = Q.get_jet_drops_by_pulse(
            self.jet_drops, pulse_number, from_jet_id=from_jet_id, limit=limit, offset=offset
        )
        drops = [
            self._render_drop(r.asDict(), [], [])
            for r in api.jet_drops_to_api(page).collect()
        ]
        return 200, {"total": total, "result": drops}

    def jet_drop_by_id(self, jet_drop_id: str) -> tuple[int, dict]:
        """reference: api/handlers.go:45-81 (code rendered '400',
        failure reason wrapped 'invalid: ...')"""
        try:
            jet_id, pulse_number = jets.parse_jet_drop_id(jet_drop_id)
        except ValueError as e:
            raise _validation_error(
                [api.ValidationFailure("jet drop id", f"invalid: {e}")], code="400"
            ) from None
        drop, prev, nxt = Q.get_jet_drop_by_id_rows(
            self.jet_drops, jet_id, pulse_number
        )
        if not drop:
            raise HttpError(404, {})
        prev_list = [self._prev_next_entry(r) for r in prev]
        next_list = [self._prev_next_entry(r) for r in nxt]
        return 200, self._render_drop(
            api.jet_drop_row_to_api(drop[0]), prev_list, next_list
        )

    def search(self, params: dict) -> tuple[int, dict]:
        """reference: api/handlers.go:458-553 (message field is
        'description' on this endpoint)"""
        value = params["value"][0] if "value" in params else ""
        try:
            kind, parsed = api.search_dispatch(value)
        except api.ValidationError as e:
            raise _validation_error(e.failures, message_field="description") from None
        if kind == "pulse":
            return 200, {"type": "pulse", "meta": {"pulse_number": parsed}}
        if kind == "jet-drop":
            return 200, {"type": "jet-drop", "meta": {"jet_drop_id": value}}
        # reference bytes: object refs answer as a lifeline, record refs
        # as the record with its index (searchReferencePulse).
        import pyspark.sql.functions as F

        as_object = self.records.filter(F.col("object_reference") == parsed).limit(1).collect()
        if as_object:
            return 200, {
                "type": "lifeline",
                "meta": {"object_reference": base58_encode(bytes(parsed))},
            }
        as_record = self.records.filter(F.col("reference") == parsed).limit(1).collect()
        if as_record:
            rec = as_record[0]
            return 200, {
                "type": "record",
                "meta": {
                    "index": f"{rec['pulse_number']}:{rec['order']}",
                    "object_reference": base58_encode(bytes(rec["object_reference"])),
                },
            }
        raise _validation_error(
            [api.ValidationFailure("value", "record reference not found")],
            message_field="description",
        )

    # -- search endpoints (engine extension; not a reference surface) --

    def attach_search(self, docs: DataFrame, index_base: str) -> None:
        """Enable /api/v1/search/*: `index_base` is a committed
        postings index (positions=True unlocks phrase/context)."""
        self.search_docs = docs
        self.search_index = index_base

    def _search_terms(self, params: dict, field: str = "query") -> list[str]:
        raw = params[field][0] if field in params else ""
        terms = [t for t in raw.lower().split() if t]
        if not terms:
            raise _validation_error(
                [api.ValidationFailure(field, "empty or missing")]
            )
        return terms

    def _search_limit(self, params: dict, default: int = 20) -> int:
        failures: list = []
        limit = _int_param(params, "limit", failures)
        if failures:
            raise _validation_error(failures)
        limit = default if limit is None else limit
        if not 1 <= limit <= 100:
            raise _validation_error(
                [api.ValidationFailure("limit", "should be in range [1, 100]")]
            )
        return limit

    def search_documents(self, params: dict) -> tuple[int, dict]:
        """BM25 top-k from the committed index — the auto serving
        policy (full vs MaxScore at the measured crossover)."""
        if self.search_index is None:
            return 404, {}
        from block_explorer_spark.operators import retrieval as R

        terms = self._search_terms(params)
        limit = self._search_limit(params)
        spark = self.search_docs.sparkSession
        rows = R.bm25_search(spark, self.search_index, terms, topk=limit).collect()
        return 200, {
            "total": len(rows),
            "result": [
                {"doc_id": r["doc_id"], "score": r["score"]} for r in rows
            ],
        }

    def search_phrase(self, params: dict) -> tuple[int, dict]:
        """Exact-phrase hits from the positional family."""
        if self.search_index is None:
            return 404, {}
        from block_explorer_spark.operators import retrieval as R

        words = self._search_terms(params, field="phrase")
        if len(words) < 2:
            raise _validation_error(
                [api.ValidationFailure("phrase", "needs at least two words")]
            )
        limit = self._search_limit(params)
        spark = self.search_docs.sparkSession
        try:
            page = (
                R.phrase_search_indexed(spark, self.search_index, words)
                .orderBy("doc_id")
                .limit(limit)
                .collect()
            )
        except FileNotFoundError:
            raise _validation_error(
                [api.ValidationFailure("phrase", "index has no positional family")]
            ) from None
        return 200, {
            "total": len(page),
            "result": [
                {"doc_id": r["doc_id"], "n_occurrences": r["n_occurrences"]}
                for r in page
            ],
        }

    def search_context(self, params: dict) -> tuple[int, dict]:
        """KWIC context windows for one term (reviewer view)."""
        if self.search_index is None:
            return 404, {}
        from block_explorer_spark.operators import retrieval as R

        term = self._search_terms(params, field="term")
        if len(term) != 1:
            raise _validation_error(
                [api.ValidationFailure("term", "exactly one word")]
            )
        limit = self._search_limit(params)
        spark = self.search_docs.sparkSession
        try:
            page = (
                R.kwic_snippets_indexed(
                    spark, self.search_index, self.search_docs, term[0]
                )
                .orderBy("doc_id", "pos")
                .limit(limit)
                .collect()
            )
        except FileNotFoundError:
            raise _validation_error(
                [api.ValidationFailure("term", "index has no positional family")]
            ) from None
        except ValueError as e:  # broadcast bound: stopword-scale term
            raise _validation_error(
                [api.ValidationFailure("term", str(e))]
            ) from None
        return 200, {
            "total": len(page),
            "result": [
                {"doc_id": r["doc_id"], "pos": r["pos"], "snippet": r["snippet"]}
                for r in page
            ],
        }


# ---------------------------------------------------------------------------
# HTTP transport
# ---------------------------------------------------------------------------

#: (metric_name, pattern, handler) — names match the reference's
#: loadtest endpoint labels (load/run_configs/all_sequence.yaml).
_ROUTES = [
    ("get_pulses", re.compile(r"^/api/v1/pulses$"), lambda a, m, p: a.pulses_list(p)),
    (
        "get_pulse",
        re.compile(r"^/api/v1/pulses/([^/]+)$"),
        lambda a, m, p: a.pulse_by_number(m.group(1)),
    ),
    (
        "get_jet_drops_by_pulse_number",
        re.compile(r"^/api/v1/pulses/([^/]+)/jet-drops$"),
        lambda a, m, p: a.jet_drops_by_pulse(m.group(1), p),
    ),
    (
        "get_jet_drop_by_id",
        re.compile(r"^/api/v1/jet-drops/([^/]+)$"),
        lambda a, m, p: a.jet_drop_by_id(unquote(m.group(1))),
    ),
    (
        # [^/]* not [^/]+: an empty jet drop id must still bind so
        # validation can reject it with 400 (e2e C5334) — a non-match
        # would fall through to the catch-all 404 instead.
        "get_records",
        re.compile(r"^/api/v1/jet-drops/([^/]*)/records$"),
        lambda a, m, p: a.jet_drop_records(unquote(m.group(1)), p),
    ),
    (
        "get_jet_drops_by_jet_id",
        re.compile(r"^/api/v1/jets/([^/]*)/jet-drops$"),
        lambda a, m, p: a.jet_drops_by_jet_id(m.group(1), p),
    ),
    (
        "get_lifeline",
        re.compile(r"^/api/v1/lifeline/([^/]+)/records$"),
        lambda a, m, p: a.object_lifeline(m.group(1), p),
    ),
    ("search", re.compile(r"^/api/v1/search$"), lambda a, m, p: a.search(p)),
    (
        "search_documents",
        re.compile(r"^/api/v1/search/documents$"),
        lambda a, m, p: a.search_documents(p),
    ),
    (
        "search_phrase",
        re.compile(r"^/api/v1/search/phrase$"),
        lambda a, m, p: a.search_phrase(p),
    ),
    (
        "search_context",
        re.compile(r"^/api/v1/search/context$"),
        lambda a, m, p: a.search_context(p),
    ),
]


class _Handler(BaseHTTPRequestHandler):
    api: BlockExplorerApi  # set by serve()

    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):  # noqa: N802 (stdlib naming)
        import time

        parsed = urlparse(self.path)
        # keep_blank_values: '?from_jet_drop_id=' is a PRESENT empty
        # param — echo binds it and validation rejects it (e2e C5234);
        # dropping it would silently un-filter instead
        params = parse_qs(parsed.query, keep_blank_values=True)
        if parsed.path == "/metrics":  # Prometheus exposition text
            return self._reply_text(200, self.api.metrics.prometheus_text())
        if parsed.path == "/metrics.json":
            spark = self.api.pulses.sparkSession
            return self._reply(200, self.api.metrics.snapshot_with_spark(spark))
        for name, pattern, fn in _ROUTES:
            m = pattern.match(parsed.path)
            if m:
                t0 = time.perf_counter()
                try:
                    status, body = fn(self.api, m, params)
                except HttpError as e:
                    status, body = e.status, e.body
                except Exception:  # internal error -> opaque {}
                    import traceback

                    traceback.print_exc()
                    status, body = 500, {}
                # error = server fault only; validation 4xx is a
                # well-formed reply (the reference's error counters
                # track handler failures the same way)
                self.api.metrics.observe(
                    name, time.perf_counter() - t0, error=status >= 500
                )
                return self._reply(status, body)
        self._reply(404, {})

    def do_POST(self):  # noqa: N802 (stdlib naming)
        if urlparse(self.path).path == "/metrics/reset":
            self.api.metrics.reset()
            return self._reply(200, {"reset": True})
        self._reply(404, {})

    def _reply_text(self, status: int, text: str):
        data = text.encode()
        self.send_response(status)
        self.send_header("Content-Type", "text/plain; version=0.0.4")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _reply(self, status: int, body: dict):
        data = json.dumps(body).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


def serve(
    api_impl: BlockExplorerApi, port: int = 0, warm: bool = True
) -> ThreadingHTTPServer:
    """Start the facade on a daemon thread; returns the bound server
    (server.server_address[1] is the actual port). Spark collects run
    on the request threads — local-mode scheduling is thread-safe.

    `warm` (round-6 item 5): run one dry request per endpoint BEFORE
    accepting traffic, so first real requests skip per-endpoint plan
    construction + whole-stage-codegen JIT — the dominant term of the
    p95 tail METRICS_LOADTEST measured in round 5 (358-789 ms firsts
    vs ~200 ms steady). Warmup calls go straight to the API object,
    so the /metrics timers only ever see real traffic."""
    if warm:
        api_impl.warmup()
    handler = type("BoundHandler", (_Handler,), {"api": api_impl})
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
