"""Measure forget_documents' cost curve at production key cardinality.

VERDICT r10 brief #4: forget's commit-cost claim — O(keys +
bloom-hit files), zero data files rewritten — was measured at 1k keys
only, but production right-to-be-forgotten requests arrive as
10^5-10^6 keys. This script pins the curve for BOTH pipelines:

- corpus: sf0.1 `documents` replicated with unique 2-token suffixes
  (distinct docs, the corpus's own text profile), ingested through
  the real pipelines in interleaved batches (doc keys deliberately do
  NOT cluster by ingest file — the pruning worst case);
- per key count K (default 1k / 32k / 256k), against an identical
  copy of the seeded warehouse: one forget of K spread-out victims,
  `count_removed=False` (the optional counting scan is measured
  separately in SCALE.md; the deletes never need it), recording
  wall seconds, per-table bloom-hit file counts (the probe the
  delete actually runs), delete-entry bytes written (equality-delete
  key parquet), and targeted-file counts from the committed
  DeleteSpecs.

If wall or delete bytes grow super-linearly in K, that's the finding.

Usage: python tools/measure_forget_cost.py [exact|near] [sizes...]
Prints one JSON line per (pipeline, K) plus a fitted summary.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from no_jvm_wap_with_iceberg_spark.session import get_spark
from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.pipelines.incremental_dedup import (
    dedup_ingest,
    forget_documents,
    near_dedup_ingest,
    near_forget,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SIZES = [1_000, 32_000, 256_000]
N_CORPUS = int(os.environ.get("SPARK_GRAFT_FORGET_CORPUS", 512_000))
N_BATCHES = 8  # interleaved ingests -> every table gets several files


def corpus_of(docs, n: int):
    """`n` distinct docs with the corpus's text profile; doc_ids are
    dense 0..n-1 so victim strides spread across every ingest batch.
    A copy-specific token is interleaved between every word: every
    word-3-gram shingle then differs across copies, so replicas are
    genuinely DISTINCT under the near pipeline too (a suffix salt
    leaves cross-copy Jaccard above the 0.7 drop threshold and the
    near corpus collapses to one copy — the admitted census must
    reach the measured key counts)."""
    base = docs.count()
    k = math.ceil(n / base)
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(c * 10_000_000)).alias("src_id"),
            F.regexp_replace(
                F.col("text"), r"\s+", f" uqfc{c} "
            ).alias("text"),
        )
        for c in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    w = out.select(
        F.row_number().over(Window.orderBy("src_id")).alias("rn"),
        "text",
    )
    return w.select((F.col("rn") - 1).alias("doc_id"), "text").limit(n)


def seed(spark, docs, pipeline: str, wh: str) -> None:
    cat = Catalog(wh)
    corpus = corpus_of(docs, N_CORPUS).cache()
    corpus.count()
    for b in range(N_BATCHES):
        # doc_id % N_BATCHES: every batch's key range spans the corpus
        batch = corpus.filter(F.col("doc_id") % N_BATCHES == b)
        if pipeline == "exact":
            dedup_ingest(spark, cat, batch, "d", "i")
        else:
            near_dedup_ingest(spark, cat, batch, "d", "s", "b")
    corpus.unpersist()


def delete_stats(cat: Catalog, tables: list[str]) -> dict:
    """Bytes of equality-delete key parquet + targeted-file counts
    from each table's delete-carrying snapshots (the forget's commit
    artifacts — 'zero data files rewritten' means THIS is the entire
    write cost)."""
    out = {"delete_key_bytes": 0, "targets": {}}
    for t in tables:
        meta = cat.load_table(t)
        n_targets = 0
        for s in meta.snapshots:
            for d in s.deletes:
                n_targets += len(d.get("targets") or [])
                for kf in d.get("key_files", []):
                    p = (
                        kf
                        if os.path.isabs(kf)
                        else os.path.join(cat.warehouse, kf)
                    )
                    if os.path.exists(p):
                        out["delete_key_bytes"] += os.path.getsize(p)
        out["targets"][t] = n_targets
    return out


def one_forget(spark, pipeline: str, seeded: str, k: int) -> dict:
    with tempfile.TemporaryDirectory(prefix="forget_cost_") as run_dir:
        wh = os.path.join(run_dir, "wh")
        shutil.copytree(seeded, wh)
        cat = Catalog(wh)
        # stride over ADMITTED docs (near dedup drops some replicas),
        # spreading victims across every ingest batch's key range —
        # the non-clustered worst case for doc-key pruning
        admitted = cat.row_count("d", spark=spark)
        stride = max(1, admitted // k)
        victims = (
            cat.read(spark, "d")
            .select("doc_id")
            .filter(F.col("doc_id") % stride == 0)
            .limit(k)
            .cache()
        )
        n = victims.count()
        tables = ["d", "i"] if pipeline == "exact" else ["d", "s", "b"]
        # the probe the delete runs, counted per table (bloom-hit files)
        hits = {}
        for t in tables:
            aff = cat._files_overlapping_keys(
                cat.load_table(t), ["doc_id"], victims
            )
            meta = cat.load_table(t)
            hits[t] = {
                "hit_files": 0 if aff is None else len(aff),
                "total_files": len(meta.files()),
            }
        t0 = time.monotonic()
        if pipeline == "exact":
            res = forget_documents(
                spark, cat, victims, "d", ["i"], count_removed=False
            )
        else:
            res = near_forget(
                spark, cat, victims, "d", "s", "b", count_removed=False
            )
        wall = time.monotonic() - t0
        victims.unpersist()
        row = {
            "pipeline": pipeline,
            "keys": n,
            "wall_s": round(wall, 2),
            "s_per_1k_keys": round(1000 * wall / n, 4),
            "strategy": res.strategy,
            "attempts": res.attempts,
            "probe": hits,
        }
        row.update(delete_stats(cat, tables))
        return row


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    sizes = [int(s) for s in sys.argv[2:]] or SIZES
    pipelines = ["exact", "near"] if which == "both" else [which]
    spark = get_spark()
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .cache()
    )
    docs.count()
    for pipeline in pipelines:
        with tempfile.TemporaryDirectory(prefix="forget_seed_") as d:
            seeded = os.path.join(d, "wh")
            t0 = time.monotonic()
            seed(spark, docs, pipeline, seeded)
            print(
                json.dumps(
                    {
                        "pipeline": pipeline,
                        "seeded_docs": N_CORPUS,
                        "seed_wall_s": round(time.monotonic() - t0, 1),
                    }
                ),
                flush=True,
            )
            walls = {}
            for k in sizes:
                r = one_forget(spark, pipeline, seeded, k)
                if r["keys"] in walls:
                    # admitted census clamped this size onto the
                    # previous point; re-measuring it adds nothing
                    print(
                        json.dumps({"skipped_size": k, "clamped_to": r["keys"]}),
                        flush=True,
                    )
                    continue
                walls[r["keys"]] = r["wall_s"]
                print(json.dumps(r), flush=True)
            # least-squares t(K) = a + b*K: a = fixed publish cost,
            # b = marginal per-key cost; sublinear-or-linear is the claim
            xs, ys = list(walls), [walls[x] for x in walls]
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            denom = sum((x - mx) ** 2 for x in xs)
            b = (
                sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
                if denom
                else 0.0
            )
            a = my - b * mx
            print(
                json.dumps(
                    {
                        "pipeline": pipeline,
                        "fit": {
                            "fixed_s": round(a, 2),
                            "s_per_100k_keys": round(100_000 * b, 3),
                        },
                        "walls": walls,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
