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
    if isinstance(value, float) and value.is_integer():
        # Arrow->pandas widens nullable int columns to float64; fold
        # integral floats onto ints so 5 and 5.0 hash identically
        # (a cross-type collision only ever ADDS a false positive)
        return int(value)
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


def merge_blooms(hex_a: str, hex_b: str) -> str:
    """Bitwise OR of two filters over the same (m, k) parameters."""
    a, b = bytes.fromhex(hex_a), bytes.fromhex(hex_b)
    return bytes(x | y for x, y in zip(a, b)).hex()


def build_blooms_distributed(
    spark, paths: list[str], cols: list[str]
) -> dict[str, dict[str, str]]:
    """Per-(file, column) bloom filters built BY EXECUTORS.

    One ``mapInPandas`` pass over the just-written files: each Arrow
    batch contributes a partial filter per (file, column) it touches
    (``input_file_name`` tags rows; a file split across tasks simply
    yields several partials), and the driver ORs the partials — a few
    KB per file — into the final filters. The driver never reads
    column data, so a large append costs it O(files), not O(rows);
    this is the write-task/commit-message split a real cluster uses.

    Returns ``{absolute_file_path: {column: hex_bloom}}``.
    """
    from pyspark.sql import functions as F

    if not paths or not cols:
        return {}

    want = list(cols)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, group in pdf.groupby("_f"):
                for c in want:
                    if c in group.columns:
                        rows.append(
                            (fname, c, build_bloom(group[c].dropna().tolist()))
                        )
            if rows:
                yield pd.DataFrame(rows, columns=["f", "c", "b"])

    df = spark.read.parquet(*paths)
    present = [c for c in want if c in df.columns]
    if not present:
        return {}
    partials = (
        df.select(F.input_file_name().alias("_f"), *present)
        .mapInPandas(gen, "f string, c string, b string")
        .collect()
    )
    out: dict[str, dict[str, str]] = {}
    for r in partials:
        # input_file_name() is URI-encoded (space -> %20 etc.) while
        # the manifest keys are raw paths; unquote (which leaves
        # literal '+' alone, unlike unquote_plus) or blooms silently
        # never attach under a warehouse path with URI-special
        # characters — same bug class as the read path's
        # _file_path_col
        from urllib.parse import unquote

        path = unquote(r["f"].removeprefix("file://"))
        per_file = out.setdefault(path, {})
        per_file[r["c"]] = (
            merge_blooms(per_file[r["c"]], r["b"]) if r["c"] in per_file else r["b"]
        )
    return out
