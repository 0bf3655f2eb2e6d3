"""Measure near_dedup_ingest's batch-size amortization curve.

VERDICT r9 brief #2: the 100 TB story for the incremental near-dup
pipeline claims its per-ingest cost is dominated by FIXED job-count
overhead (probe jobs + in-batch subtree materializations) that
amortizes with batch size — asserted from instrumentation, never
measured as a curve. This script pins it: one e2e ingest cycle per
batch size against a pre-seeded index, wall-clocked, then a least-
squares fit t(B) = a + b*B to report the fixed intercept `a` and the
fixed-overhead share a/t(B) at each size.

Workload: sf0.1 `documents` (5k docs) replicated deterministically —
each copy gets a 2-token unique suffix, so copies are distinct docs
with the corpus's own length/shingle profile (near-dup relationships
WITHIN a copy are preserved; suffixes keep cross-copy Jaccard of the
same base doc just under/around the 0.7 threshold for long docs, so
the verify pass gets real work too). doc_ids are offset per copy.

Usage: python tools/measure_near_amortization.py [reps]
Prints one JSON line per (size, rep) plus the fitted summary.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.session import get_spark
from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup import (
    near_dedup_ingest,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SIZES = [1600, 8000, 32000]
SEED_SIZE = 1600  # index state every measured ingest probes against


def batch_of(docs, size: int, tag: str):
    """`size` distinct docs with the corpus's text profile."""
    n = docs.count()
    k = math.ceil(size / n)
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(c * 10_000_000)).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(f" uq{tag}c{c}a uq{tag}c{c}b")
            ).alias("text"),
        )
        for c in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.limit(size)


def one_cycle(spark, docs, size: int) -> dict:
    """Seed an index with SEED_SIZE docs, then time ONE ingest of
    `size` docs against it (the steady-state shape: non-empty index,
    full probe + verify + 3-table pinned publish)."""
    with tempfile.TemporaryDirectory(prefix="near_amort_") as wh:
        cat = Catalog(wh)
        seed = batch_of(docs, SEED_SIZE, "seed")
        near_dedup_ingest(spark, cat, seed, "d", "s", "b")
        batch = batch_of(docs, size, "m")
        t0 = time.monotonic()
        res = near_dedup_ingest(spark, cat, batch, "d", "s", "b")
        wall = time.monotonic() - t0
        return {
            "size": size,
            "wall_s": round(wall, 2),
            "admitted": res.rows_published,
            # the workload is deliberately dup-heavy (salted copies of
            # the same corpus, like a real re-crawl), so per-INGESTED
            # is the stable unit; per-admitted divides by a near-zero
            # at small sizes
            "s_per_1k_ingested": round(1000 * wall / size, 3),
            "s_per_1k_admitted": round(1000 * wall / max(res.rows_published, 1), 3),
        }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark()
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .cache()
    )
    docs.count()
    runs: list[dict] = []
    for rep in range(reps):  # interleave sizes to spread host drift
        for size in SIZES:
            r = one_cycle(spark, docs, size)
            r["rep"] = rep
            runs.append(r)
            print(json.dumps(r), flush=True)
    # per-size best (min wall: least drift-contaminated)
    best = {
        s: min(r["wall_s"] for r in runs if r["size"] == s) for s in SIZES
    }
    # least-squares t(B) = a + b*B over the per-size minima
    xs, ys = list(best), [best[s] for s in best]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    a = my - b * mx
    print(
        json.dumps(
            {
                "fit": {
                    "fixed_overhead_s": round(a, 2),
                    "s_per_1k_docs": round(1000 * b, 3),
                },
                "fixed_share": {
                    str(s): round(a / best[s], 3) for s in SIZES
                },
                "best_wall_s": best,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
