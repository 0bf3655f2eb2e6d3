"""Per-file bloom filters: point-lookup pruning beyond min/max stats.

Min/max stats prune range predicates but are useless for equality
probes on UNSORTED columns — every file's [min, max] spans the
needle. A small per-file bloom filter (1 KiB, k=6: ~0.1% false
positives at ~1k distinct values/file, degrading gracefully above)
lets `Predicate.eq` skip files that provably lack the value — the
same idea as Parquet's optional bloom filters and Iceberg's
`write.metadata.metrics` ndv sketches, kept engine-side so pruning
happens before Spark ever sees the path list.

Build cost is one columnar read of the indexed columns per written
file, paid at commit time; on a real cluster the WRITE tasks build
the filter as rows stream through and ship it in the commit message —
the local implementation reads the column back, which costs the same
IO the footer-stat collection already pays per file.

Serialized as hex in the file entry (`blooms: {col: hex}`); absent
filters simply don't prune (correctness never depends on them).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
from typing import Any, Iterable

M_BITS = 8192  # 1 KiB per (file, column)
K_HASHES = 6


def _canon(value: Any) -> Any:
    """One canonical form per logical value, whatever producer it came
    from: Arrow ``to_pylist`` yields datetime/bytes, a Spark ``collect``
    yields datetime/bytearray — their ``repr``s differ, which would make
    a bloom built from one side false-NEGATIVE against a probe from the
    other. Timestamps/dates canonicalize to ISO strings (same as stored
    stats), binary to hex."""
    if isinstance(value, (_dt.datetime, _dt.date)):
        return value.isoformat()
    if isinstance(value, (bytes, bytearray, memoryview)):
        return bytes(value).hex()
    return value


def _hashes(value: Any) -> list[int]:
    """k deterministic bit positions for a value (type-canonical)."""
    # canonical bytes: ints/floats/strings hash by text form — the
    # same canonicalization the pruning probe uses
    data = repr(_canon(value)).encode("utf-8")
    digest = hashlib.blake2b(data, digest_size=16).digest()
    out = []
    for i in range(K_HASHES):
        chunk = int.from_bytes(digest[(2 * i): (2 * i + 2)], "little")
        # mix the hash index in so two-byte windows stay independent
        out.append((chunk * 0x9E37 + i * 0x85EB) % M_BITS)
    return out


def build_bloom(values: Iterable[Any]) -> str:
    """Hex-encoded bloom filter over the (non-null) values."""
    bits = bytearray(M_BITS // 8)
    for v in values:
        if v is None:
            continue
        for pos in _hashes(v):
            bits[pos // 8] |= 1 << (pos % 8)
    return bytes(bits).hex()


def bloom_may_contain(hex_bloom: str, value: Any) -> bool:
    """False only if the filter PROVES the value is absent."""
    bits = bytes.fromhex(hex_bloom)
    return all(
        bits[pos // 8] & (1 << (pos % 8)) for pos in _hashes(value)
    )
