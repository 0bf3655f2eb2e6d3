"""Probe-pruning soak for the incremental-dedup indexes (SCALE.md
round-7 evidence).

Proves the round-7 claim directly: with >10k-unique-digest batches —
the regime where the round-6 probe silently degraded to a full index
scan — the probe's AFFECTED-FILE COUNT stays a small fraction of the
live index files, i.e. "nothing ever scans the full index" is true as
written, measured, not argued.

Two layouts, because the pruning evidence differs:

- ``prefix4``: a ``truncate(4, fingerprint)``-partitioned index (the
  production layout for ≫10^7-digest corpora). The partition-value
  set lookup bounds candidates by the batch's prefix coverage
  (1 - e^(-batch/65536) of files) BEFORE ranges or blooms — no
  key-count cap applies to a set lookup.
- ``auto-evolving``: the pipeline's round-8 self-sizing default —
  starts at ``truncate(1, ...)`` and auto-evolves to wider prefixes
  as the digest count crosses INDEX_WIDTH_SCHEDULE (shrunk here so a
  step fires INSIDE the soak). A >10k batch covers every prefix at
  these widths, so the partition set prunes little — ALL pruning
  comes from the executor-side probe: per-file range slicing first,
  then blooms against only the in-range keys, which is what keeps
  1 KiB blooms effective at any batch size — and the probe must stay
  flat ACROSS the evolution step, mixed file eras live.

Each round ingests a batch of unique synthetic docs, then probes the
grown index with the NEXT batch's digests and records
``affected / total`` live files plus the probe wall time. Disjoint
batches make every affected file a false positive — the measured
fraction is the probe's actual noise floor.

Usage: python tools/soak_dedup_probe.py [batch_size] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from no_jvm_wap_with_iceberg_spark.catalog import Catalog  # noqa: E402
from no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup import (  # noqa: E402
    dedup_ingest,
    fingerprint_expr,
)
from no_jvm_wap_with_iceberg_spark.session import get_spark  # noqa: E402


def synth_batch(spark, start: int, n: int):
    """n unique documents (distinct text per doc_id)."""
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body "),
            F.sha2(F.col("id").cast("string"), 256),
            F.lit(" tail"),
        ).alias("text"),
    )


def run_layout(spark, label: str, width: int | None, batch: int, rounds: int):
    """``width=None`` runs the pipeline's self-sizing default (round-8:
    starts at truncate(1), auto-evolves per INDEX_WIDTH_SCHEDULE — the
    soak's digest counts cross the first threshold, so this layout
    measures the probe ACROSS an evolution step, mixed eras live)."""
    d = tempfile.mkdtemp(prefix=f"soak_probe_{label}_")
    cat = Catalog(d)
    out = []
    try:
        for r in range(rounds):
            b = synth_batch(spark, r * batch, batch)
            t0 = time.time()
            if width:
                res = dedup_ingest(
                    spark, cat, b, "docs", "fp_index",
                    index_prefix_width=width,
                )
            else:
                res = dedup_ingest(spark, cat, b, "docs", "fp_index")
            t_ingest = time.time() - t0
            # probe the grown index with the NEXT (disjoint) batch
            nxt = synth_batch(spark, (rounds + r) * batch, batch)
            probe = nxt.select(
                fingerprint_expr("text").alias("fingerprint")
            )
            meta = cat.load_table("fp_index")
            total = len(meta.files())
            t1 = time.time()
            affected = cat._files_overlapping_keys(
                meta, ["fingerprint"], probe
            )
            t_probe = time.time() - t1
            row = {
                "layout": label,
                "round": r,
                "rows_published": res.rows_published,
                "index_width": meta.partition_by,
                "index_files": total,
                "affected": len(affected),
                "affected_frac": round(len(affected) / max(total, 1), 4),
                "ingest_s": round(t_ingest, 2),
                "probe_s": round(t_probe, 2),
            }
            out.append(row)
            print(json.dumps(row), flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="soak_dedup_probe")
    # shrink the evolution schedule so the self-sizing layout crosses
    # ONE width step inside the soak (default thresholds need 100k
    # digests): 1 -> 2 after the first ingest, migrating the 16
    # width-1 files whose saturated blooms would otherwise be admitted
    # by every later probe
    import no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup as idd

    idd.INDEX_WIDTH_SCHEDULE = ((batch, 2),)
    dflt = run_layout(spark, "auto-evolving", None, batch, rounds)
    pfx = run_layout(spark, "prefix4", 4, batch, rounds)
    worst = max(r["affected_frac"] for r in dflt + pfx)
    print(
        json.dumps(
            {
                "batch": batch,
                "rounds": rounds,
                "worst_affected_frac": worst,
                "claim_holds": worst < 0.5,
            }
        )
    )


if __name__ == "__main__":
    main()
