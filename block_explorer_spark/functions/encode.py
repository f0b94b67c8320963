"""API-edge rendering (X1-X3, X8): base64/hex bytes, composite ids.

All JVM-side column expressions — the API layer projects with these,
it never collects raw bytes into Python.
reference: api/mappers.go:19-94
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def b64(col: Column | str) -> Column:
    """X1: bytea -> base64 string for JSON output (api/mappers.go:23-27)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.base64(c)


def record_index_col(
    pulse_number: Column | str = "pulse_number", order: Column | str = "order"
) -> Column:
    """X3: "<pulse>:<order>" — the keyset-pagination cursor string.

    reference: api/mappers.go:26, etl/storage/storage.go:147-163
    """
    p = F.col(pulse_number) if isinstance(pulse_number, str) else pulse_number
    o = F.col(order) if isinstance(order, str) else order
    return F.concat_ws(":", p.cast("string"), o.cast("string"))


def parse_record_index(value: str) -> tuple[int, int]:
    """X3 inverse, driver-side param validation (CheckIndex)."""
    parts = value.split(":")
    if len(parts) != 2:
        raise ValueError(f"invalid index {value!r}, expected '<pulse>:<order>'")
    return int(parts[0]), int(parts[1])


def nanos_to_seconds(col: Column | str) -> Column:
    """X8: platform nanosecond timestamps -> unix seconds.

    Exact integer division: ns epochs (~1.6e18) exceed double's 2^53
    integer range, so `(c / 1e9).cast(long)` can truncate one second
    low at exact-second boundaries. Decimal division then cast keeps
    the int64-division semantics of the reference
    (instrumentation/converter/converter.go:34-41).
    """
    c = F.col(col) if isinstance(col, str) else col
    # Strip the sub-second remainder first (long % is exact and its sign
    # follows the dividend, matching Go's truncate-toward-zero), then
    # divide the exact multiple via decimal so no rounding can occur.
    whole = c - (c % F.lit(1_000_000_000))
    return (whole.cast("decimal(38,0)") / F.lit(1_000_000_000)).cast("long")


# Platform pulse-number validity range (X12): 65536 <= pn < 2^32 - 1.
MIN_PULSE = 65536
MAX_PULSE = 4294967295


def is_valid_pulse_number(pn: int) -> bool:
    """X12 driver-side validator (api/handlers.go:302,321,407)."""
    return MIN_PULSE <= pn < MAX_PULSE
