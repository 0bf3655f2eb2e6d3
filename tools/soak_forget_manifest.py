"""Manifest-scale soak for the layout-aligned near-forget delete and
the rebuild's atomic replace (VERDICT r10 brief #6: the band-delete
pruning claim was pinned on a 5k-doc toy corpus; pin it on a >=100k
file band manifest).

The manifests model the band index's steady state AFTER per-partition
binpack compaction at production row counts: ``bucket(512,
band_hash)`` hive partitions; within a bucket, files tile the signed
64-bit band-hash space with DISJOINT sorted ranges (the clustered-
compaction invariant, same modeling as soak_probe_manifest.py for the
exact index); every file's ``doc_id`` min/max spans the whole corpus
(interleaved ingest keys — the worst case that defeats doc-key
pruning and motivated the composite delete); blooms absent (saturated
at production rows/file — range + bucket evidence is what prunes).

Per census (33k / 100k / 300k files), with 1k victims x 16 bands
(the 16k-pair probe VERDICT r10 flagged):

- doc-keyed probe (the GENERIC delete's shape): expected to target
  every file — O(table);
- composite (band_hash, key) probe (near_forget_documents' shape):
  each pair's bucket + range evidence admits exactly one file, so
  targets are bounded by the victims' DISTINCT band hashes (<= 16k)
  no matter the census — O(victims' bands). If the targeted count
  grows with the census, the claim is broken and that's the finding.

- rebuild commit shape at the same census: the staged replace's
  driver-side work is one ``with_new_snapshot('overwrite')`` over the
  old manifest plus serializing the NEW metadata; measured wall and
  serialized bytes are reported so the O(new files + retained
  history) commit cost is a number, not an assertion.

Usage: python tools/soak_forget_manifest.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from no_jvm_wap_with_iceberg_spark.catalog import Catalog  # noqa: E402
from no_jvm_wap_with_iceberg_spark.catalog.table import (  # noqa: E402
    FileEntry,
    Snapshot,
    TableMetadata,
)
from no_jvm_wap_with_iceberg_spark.session import get_spark  # noqa: E402

BUCKETS = 512
SPACE = 1 << 63  # non-negative half of the signed 64-bit hash space
N_VICTIMS = 1_000
BANDS = 16
CORPUS = 10_000_000


def synth_band_manifest(n_files: int) -> TableMetadata:
    """n files across BUCKETS hash buckets; within a bucket, disjoint
    sorted band_hash ranges tiling the space; doc_id stats span the
    corpus in EVERY file (interleaved ingest keys)."""
    per_bucket = [n_files // BUCKETS] * BUCKETS
    for p in range(n_files % BUCKETS):
        per_bucket[p] += 1
    files: list[FileEntry] = []
    i = 0
    for b in range(BUCKETS):
        m = per_bucket[b]
        if m == 0:
            continue
        sub = SPACE // m
        for j in range(m):
            lo = j * sub
            hi = (j + 1) * sub - 1 if j < m - 1 else SPACE - 1
            files.append(
                FileEntry(
                    path=f"tables/band/data/{b}/f{i}.parquet",
                    rows=250_000,
                    bytes=16 << 20,
                    columns={
                        "band_hash": {"nulls": 0, "min": lo, "max": hi},
                        "doc_id": {"nulls": 0, "min": 0, "max": CORPUS},
                    },
                    partition={"band_hash_bucket512": str(b)},
                )
            )
            i += 1
    schema = T.StructType(
        [
            T.StructField("band_hash", T.LongType()),
            T.StructField("doc_id", T.LongType()),
        ]
    )
    return TableMetadata(
        table="band",
        schema_json=schema.jsonValue(),
        snapshots=[Snapshot(1, None, 0, "append", files)],
        current_snapshot_id=1,
        version=1,
        partition_by=[f"bucket({BUCKETS}, band_hash)"],
        sort_by=["band_hash"],
    )


def victim_pairs(spark):
    """1k victims x 16 deterministic band hashes, spread across the
    space (golden-ratio stride) — the shape near_forget_documents
    derives from the signature table."""
    rows = []
    for v in range(N_VICTIMS):
        doc_id = (v * (CORPUS // N_VICTIMS)) % CORPUS
        for band in range(BANDS):
            h = ((v * BANDS + band + 1) * 0x9E3779B97F4A7C15) % SPACE
            rows.append((h, doc_id))
    return spark.createDataFrame(
        rows, "band_hash LONG, doc_id LONG"
    ), len({h for h, _ in rows})


def main() -> None:
    spark = get_spark()
    cat = Catalog(tempfile.mkdtemp(prefix="soak_forget_manifest_"))
    pairs, n_distinct_bands = victim_pairs(spark)
    keys = pairs.select("doc_id").distinct()
    pairs.count()  # warm the session
    out = []
    for n_files in (33_000, 100_000, 300_000):
        meta = synth_band_manifest(n_files)
        t0 = time.time()
        doc_hit = cat._files_overlapping_keys(meta, ["doc_id"], keys)
        t_doc = time.time() - t0
        t0 = time.time()
        comp_hit = cat._files_overlapping_keys(
            meta, ["band_hash", "doc_id"], pairs
        )
        t_comp = time.time() - t0
        # rebuild commit shape: one replace snapshot over the old
        # manifest + serializing the new metadata (the staged
        # replace's entire driver-side cost — no data file is read)
        new_files = meta.files()[: max(1, n_files // 10)]
        t0 = time.time()
        meta2 = meta.with_new_snapshot(new_files, "overwrite")
        blob = json.dumps(meta2.to_json())
        t_rebuild = time.time() - t0
        row = {
            "files": n_files,
            "victims": N_VICTIMS,
            "victim_bands": n_distinct_bands,
            "doc_keyed_targets": len(doc_hit),
            "composite_targets": len(comp_hit),
            "composite_frac": round(len(comp_hit) / n_files, 4),
            "probe_s": {
                "doc_keyed": round(t_doc, 2),
                "composite": round(t_comp, 2),
            },
            "rebuild_commit": {
                "wall_s": round(t_rebuild, 2),
                "metadata_bytes": len(blob),
            },
        }
        out.append(row)
        print(json.dumps(row), flush=True)
    summary = {
        "claim": "composite (band_hash, key) targets bounded by victims' "
        "bands at any census; doc-keyed targets the table",
        "rounds": out,
        "claim_holds": all(
            r["composite_targets"] <= r["victim_bands"]
            and r["doc_keyed_targets"] == r["files"]
            for r in out
        ),
    }
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            json.dump(summary, fh, indent=2)
    print(json.dumps({"claim_holds": summary["claim_holds"]}))


if __name__ == "__main__":
    main()
