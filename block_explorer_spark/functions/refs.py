"""Reference (X9) and bytes-hygiene (X10) helpers.

Base58 reference parsing is an API-edge (driver-side) concern — never a
per-row DataFrame op — so it is plain Python with no external deps.
reference: api/handlers.go:658-676,515-553; instrumentation/comparator.go:7-12
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}


def base58_decode(s: str) -> bytes:
    """Decode a base58 string (Bitcoin alphabet) to bytes."""
    num = 0
    for ch in s:
        if ch not in _B58_INDEX:
            raise ValueError(f"invalid base58 character {ch!r}")
        num = num * 58 + _B58_INDEX[ch]
    raw = num.to_bytes((num.bit_length() + 7) // 8, "big") if num else b""
    pad = len(s) - len(s.lstrip("1"))
    return b"\x00" * pad + raw


def base58_encode(b: bytes) -> str:
    num = int.from_bytes(b, "big")
    out = []
    while num:
        num, rem = divmod(num, 58)
        out.append(_B58_ALPHABET[rem])
    pad = len(b) - len(b.lstrip(b"\x00"))
    return "1" * pad + "".join(reversed(out))


def parse_reference(value: str) -> bytes:
    """X9: base58 API reference -> raw bytes; raises on junk.

    The reference distinguishes object refs (self-referential) from
    record refs structurally; we preserve only the validation + decode
    because downstream filters operate on raw bytes.
    """
    value = value.strip()
    if not value:
        raise ValueError("empty reference")
    return base58_decode(value)


def null_if_empty_bytes(col: Column | str) -> Column:
    """X10: all-zero or empty bytea behaves as NULL.

    reference: instrumentation/comparator.go:7-12 (IsEmpty), applied in
    api/mappers.go:32-49 before rendering refs.
    """
    c = F.col(col) if isinstance(col, str) else col
    # JVM-only check: hex() of all-zero bytes contains only '0' chars.
    hexed = F.hex(c)
    return F.when(
        c.isNull() | (F.length(c) == 0) | (F.translate(hexed, "0", "") == ""), F.lit(None)
    ).otherwise(c)
