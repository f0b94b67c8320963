"""Explicit StructTypes for every table the engine reads or writes.

Core (GBE) tables mirror the reference's fixed, migration-versioned
schemas (reference: migrations/migrations.go:11-89,
etl/models/models.go:31-75) — primitives only: longs, ints, bools,
strings, binary. Schema is static, so nothing is ever inferred; every
reader pins the schema which also lets the parquet scan prune columns.

Driver (TPC-H-ish) tables mirror /root/testdata/sf*/ parquet files.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# GBE core tables
# --------------------------------------------------------------------------

#: One row per ledger pulse (~10 s consensus epoch / block height).
#: reference: etl/models/models.go:66-75
PULSES = T.StructType(
    [
        T.StructField("pulse_number", T.LongType(), False),
        T.StructField("prev_pulse_number", T.LongType(), True),
        T.StructField("next_pulse_number", T.LongType(), True),
        T.StructField("is_complete", T.BooleanType(), False),
        T.StructField("is_sequential", T.BooleanType(), False),
        T.StructField("timestamp", T.LongType(), True),
        # Denormalized counters in the reference (mutated per load,
        # etl/storage/storage.go:56-60); here they are *derived* by
        # aggregation and only materialized into this schema on write.
        T.StructField("jet_drop_amount", T.LongType(), True),
        T.StructField("record_amount", T.LongType(), True),
    ]
)

#: One row per (pulse, jet). jet_id is a binary-prefix string
#: ("" = root jet, rendered "*" at the API edge).
#: reference: etl/models/models.go:46-55
JET_DROPS = T.StructType(
    [
        T.StructField("pulse_number", T.LongType(), False),
        T.StructField("jet_id", T.StringType(), False),
        T.StructField("first_prev_hash", T.BinaryType(), True),
        T.StructField("second_prev_hash", T.BinaryType(), True),
        T.StructField("hash", T.BinaryType(), True),
        T.StructField("raw_data", T.BinaryType(), True),
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("record_amount", T.IntegerType(), True),
    ]
)

#: One row per ledger record. `order` is assigned at transform time by
#: the per-object chain sort (reference: etl/processor/processor.go:152-167)
#: and is the load-bearing ordering invariant — never inferred at read.
#: reference: etl/models/models.go:31-44
RECORDS = T.StructType(
    [
        T.StructField("reference", T.BinaryType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("object_reference", T.BinaryType(), True),
        T.StructField("prototype_reference", T.BinaryType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("prev_record_reference", T.BinaryType(), True),
        T.StructField("hash", T.BinaryType(), True),
        T.StructField("raw_data", T.BinaryType(), True),
        T.StructField("jet_id", T.StringType(), False),
        T.StructField("pulse_number", T.LongType(), False),
        T.StructField("order", T.IntegerType(), True),
        T.StructField("timestamp", T.LongType(), True),
    ]
)

RECORD_TYPES = ("state", "request", "result")

#: Raw (pre-transform) platform records as they leave the extractor,
#: before D2 decode collapses the 6 platform kinds into RECORD_TYPES.
#: reference: etl/types/types.go:14-17, etl/transformer/transformer.go:207-292
RAW_RECORDS = T.StructType(
    [
        T.StructField("reference", T.BinaryType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("object_reference", T.BinaryType(), True),
        T.StructField("prototype_reference", T.BinaryType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("prev_record_reference", T.BinaryType(), True),
        T.StructField("hash", T.BinaryType(), True),
        T.StructField("raw_data", T.BinaryType(), True),
        T.StructField("jet_id", T.StringType(), False),
        T.StructField("pulse_number", T.LongType(), False),
        # stamped by the extractor from the pulse (the reference copies
        # it in the processor: etl/processor/processor.go:165)
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("position", T.IntegerType(), True),
        # Real pulse-chain links as delivered by the platform pulse
        # stream (FullPulse carries PrevPulseNumber/NextPulseNumber;
        # etl/extractor/platform_pulse.go:43-57). Nullable: file-based
        # stand-in sources that lack them fall back to the nominal
        # step-10 cadence at ingest (streaming/pipeline.py).
        T.StructField("prev_pulse_number", T.LongType(), True),
        T.StructField("next_pulse_number", T.LongType(), True),
    ]
)

#: The 6 platform record kinds, collapsed to RECORD_TYPES by D2.
RAW_KINDS_STATE = ("activate", "amend", "deactivate")
RAW_KINDS = RAW_KINDS_STATE + ("result", "incoming_request", "outgoing_request")

# --------------------------------------------------------------------------
# Driver-provided TPC-H-ish tables (/root/testdata/sf*/)
# --------------------------------------------------------------------------

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
