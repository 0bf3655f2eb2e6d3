"""Manifest-scale soak for the keyed-mutation probe (VERDICT r7
next-round item 6 / SCALE.md round-7 addendum's "residual slope").

Measures the FULL probe (``Catalog._files_overlapping_keys``) against
synthetic manifests of 33k -> 1M live files, isolating how it scales
with the file census. Two findings drove the round-8 shape (SCALE.md
round-8 addendum):

- The r7 slope was NOT the per-file python loop (layers 1-2 cost
  ~1.2 us/file warm — the first partition check is a set-miss
  short-circuit for every untouched file; a numpy whole-manifest
  variant was built and benchmarked SLOWER at every point, then
  removed). It was the executor-side exact probe doing O(keys x
  candidate files) pandas masks.
- ``keyprobe.probe_files_spark`` now takes a sorted-keys
  ``searchsorted`` fast path for single string key columns (the
  sha256-digest hot path): ~30 s -> ~3 s at 12k keys x 16k
  candidates; general multi-column/bloom semantics unchanged.

The manifests model the dedup index's steady state AFTER binpack
compaction at production digest counts: ``truncate(4, fingerprint)``
hive partitions, partition-pure files with DISJOINT sorted digest
ranges, blooms absent (saturated blooms are dropped by compaction —
range evidence is what prunes). File entries are constructed in
memory — manifest JSON parse time is out of scope; this isolates the
probe. The 12k-digest batch is above PROBE_DRIVER_KEYS_MAX, so the
admitted tail goes through the executor-side exact probe, same as
production. Because the ranges tile the digest space, every batch key
lands in exactly one file's range — expected admissions are bounded
by the BATCH, never O(corpus files); that ratio holding at 1M files
is the 100 TB claim.

Usage: python tools/soak_probe_manifest.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, types as T  # noqa: E402

from no_jvm_wap_with_iceberg_spark.catalog import Catalog  # noqa: E402
from no_jvm_wap_with_iceberg_spark.catalog.table import (  # noqa: E402
    FileEntry,
    Snapshot,
    TableMetadata,
)
from no_jvm_wap_with_iceberg_spark.session import get_spark  # noqa: E402

SPACE = 1 << 256  # sha256 digest space
BATCH = 12_000


def synth_manifest(n_files: int) -> TableMetadata:
    """n partition-pure files tiling the digest space with disjoint
    sorted ranges — the binpacked steady state of the fingerprint
    index at production digest counts."""
    npart = 65_536
    files: list[FileEntry] = []
    if n_files <= npart:
        # fewer files than prefixes: each file owns one whole prefix
        # (a corpus that hasn't filled the space yet) — the partition
        # value must be the range's TRUE 4-hex prefix or the manifest
        # is self-inconsistent and layer-1 pruning tests nothing real
        per_part = [0] * npart
        for i in range(n_files):
            per_part[i * npart // n_files] = 1
    else:
        per_part = [n_files // npart] * npart
        for p in range(n_files % npart):
            per_part[p] += 1
    span = SPACE // npart
    i = 0
    for p in range(npart):
        base = p * span
        prefix = f"{p:04x}"
        m = per_part[p]
        if m == 0:
            continue
        sub = span // m
        for j in range(m):
            lo = base + j * sub
            hi = base + (j + 1) * sub - 1 if j < m - 1 else base + span - 1
            files.append(
                FileEntry(
                    path=f"tables/idx/data/{prefix}/f{i}.parquet",
                    rows=1_000_000,
                    bytes=128 << 20,
                    columns={
                        "fingerprint": {
                            "nulls": 0,
                            "min": f"{lo:064x}",
                            "max": f"{hi:064x}",
                        }
                    },
                    partition={"fingerprint_truncate4": prefix},
                )
            )
            i += 1
    schema = T.StructType(
        [
            T.StructField("fingerprint", T.StringType()),
            T.StructField("doc_id", T.LongType()),
        ]
    )
    return TableMetadata(
        table="idx",
        schema_json=schema.jsonValue(),
        snapshots=[Snapshot(1, None, 0, "append", files)],
        current_snapshot_id=1,
        version=1,
        partition_by=["truncate(4, fingerprint)"],
        sort_by=["fingerprint"],
    )


def main() -> None:
    spark = get_spark()
    cat = Catalog(tempfile.mkdtemp(prefix="soak_probe_manifest_"))
    kdf = spark.range(0, BATCH).select(
        F.sha2(F.col("id").cast("string"), 256).alias("fingerprint")
    )
    kdf.count()  # warm the session so the first timing isn't JVM start
    out = []
    for n_files in (33_000, 100_000, 300_000, 1_000_000):
        meta = synth_manifest(n_files)
        cat._files_overlapping_keys(meta, ["fingerprint"], kdf)  # warm
        t0 = time.time()
        affected = cat._files_overlapping_keys(meta, ["fingerprint"], kdf)
        row = {
            "files": n_files,
            "batch": BATCH,
            "probe_s": round(time.time() - t0, 2),
            "affected": len(affected),
            "affected_frac": round(len(affected) / n_files, 4),
        }
        out.append(row)
        print(json.dumps(row), flush=True)
    summary = {
        "claim": "probe admissions batch-bounded and wall time near-flat "
        "33k->1M live files",
        "rounds": out,
        "claim_holds": all(r["affected"] <= 2 * BATCH for r in out),
    }
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            json.dump(summary, fh, indent=2)
    print(json.dumps({"claim_holds": summary["claim_holds"]}))


if __name__ == "__main__":
    main()
