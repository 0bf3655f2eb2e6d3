"""Incremental cross-batch exact dedup against a persisted fingerprint
index — the production LLM-corpus ingest shape.

Batches arrive over time; each incoming batch must be deduplicated not
just within itself but against EVERYTHING previously admitted to the
corpus. Recomputing global dedup per batch is O(corpus) and dies at
100 TB; this pipeline keeps a catalog table of content fingerprints and
makes each ingest O(batch + bloom-hit index files):

1. **Fingerprint** the batch (sha256 over optionally
   whitespace/case-normalized content) and keep-first WITHIN the batch
   (min key per digest — deterministic, no window sort).
2. **Probe the index** through the catalog's shared key-pruning pass
   (``Catalog._files_overlapping_keys``: per-file min/max ranges first,
   then per-file bloom probes with the exact digests). The index table
   is created with ``bloom_cols=["fingerprint"]`` and
   ``sort_by=["fingerprint"]``, so each append lands digest-sorted
   files with tight ranges + blooms — at any corpus size the probe
   reads only files that MAY hold a batch digest, and the scan itself
   inner-joins the broadcast digest set. Nothing ever scans the full
   index.
3. **Publish atomically**: the surviving rows append to the documents
   table AND their fingerprints to the index table on a hidden staging
   branch that fast-forwards into the target in ONE ref CAS — readers
   never observe docs without their fingerprints (or vice versa), and
   two RACING ingests cannot both admit the same digest: the loser's
   fast-forward fails and the retry RE-PROBES the fresh index, so the
   duplicate is caught exactly where the race window was.

The reference has no dedup at all; the WAP branch/publish machinery
this rides is its core loop (``src/serverless/app.py:235-317``).
"""

from __future__ import annotations

import dataclasses
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.catalog.catalog import MAIN, CommitConflict


@dataclasses.dataclass
class DedupIngestResult:
    published: bool
    rows_in: int
    in_batch_dups: int  # duplicates removed within the batch itself
    seen_dups: int  # rows whose digest the index already held
    rows_published: int
    attempts: int


def fingerprint_expr(content_col: str, normalize: bool = True):
    """sha256 digest of the content column; ``normalize`` folds case
    and collapses runs of whitespace first (the usual exact-dedup
    normalization for web text)."""
    c = F.col(content_col)
    if normalize:
        c = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.sha2(c, 256)


def dedup_ingest(
    spark: SparkSession,
    cat: Catalog,
    batch: DataFrame,
    docs_table: str,
    index_table: str,
    key_col: str = "doc_id",
    content_col: str = "text",
    branch: str = MAIN,
    normalize: bool = True,
    max_retries: int = 3,
) -> DedupIngestResult:
    """Admit ``batch`` into ``docs_table``, exactly-once by content.

    Creates both tables lazily (the index digest-sorted with blooms).
    Returns counts; ``published=False`` only for an all-duplicate
    batch (nothing to commit is success, not failure).
    """
    fp_batch = batch.withColumn(
        "_fp", fingerprint_expr(content_col, normalize)
    )
    # keep-first within the batch: min key per digest, then semi-join
    # back — one shuffle on the digest, no per-group sort
    firsts = fp_batch.groupBy("_fp").agg(F.min(key_col).alias(key_col))
    unique_batch = fp_batch.join(
        firsts, on=["_fp", key_col], how="left_semi"
    ).cache()
    rows_in = batch.count()
    n_unique = unique_batch.count()

    cat.create_table(docs_table, batch.schema, branch, if_not_exists=True)
    idx_schema = (
        unique_batch.select(
            F.col("_fp").alias("fingerprint"), F.col(key_col)
        ).schema
    )
    cat.create_table(
        index_table,
        idx_schema,
        branch,
        sort_by=["fingerprint"],
        bloom_cols=["fingerprint"],
        if_not_exists=True,
    )

    last_err: Exception | None = None
    for attempt in range(1, max_retries + 2):
        meta = cat.load_table(index_table, branch)
        probe = unique_batch.select(F.col("_fp").alias("fingerprint"))
        affected = cat._files_overlapping_keys(meta, ["fingerprint"], probe)
        if affected:
            seen = (
                cat._df_applying_deletes(spark, meta, affected)
                .select("fingerprint")
                .join(F.broadcast(probe.distinct()), "fingerprint", "inner")
                .select(F.col("fingerprint").alias("_fp"))
                .distinct()
            )
            fresh = unique_batch.join(seen, "_fp", "left_anti")
        else:
            fresh = unique_batch
        n_fresh = fresh.count()
        if n_fresh == 0:
            unique_batch.unpersist()
            return DedupIngestResult(
                published=False,
                rows_in=rows_in,
                in_batch_dups=rows_in - n_unique,
                seen_dups=n_unique,
                rows_published=0,
                attempts=attempt,
            )
        stage = f"dedup-{uuid.uuid4().hex[:12]}"
        cat.create_branch(stage, from_branch=branch)
        try:
            cat.append(
                fresh.select(*[f.name for f in batch.schema.fields]),
                docs_table,
                stage,
            )
            cat.append(
                fresh.select(
                    F.col("_fp").alias("fingerprint"), F.col(key_col)
                ),
                index_table,
                stage,
            )
            cat.merge(stage, branch)
            unique_batch.unpersist()
            return DedupIngestResult(
                published=True,
                rows_in=rows_in,
                in_batch_dups=rows_in - n_unique,
                seen_dups=n_unique - n_fresh,
                rows_published=n_fresh,
                attempts=attempt,
            )
        except CommitConflict as ex:
            # a racing ingest published first; re-probe the FRESH
            # index so a digest it admitted cannot slip in twice
            last_err = ex
        finally:
            try:
                cat.drop_branch(stage)
            except KeyError:
                pass
    unique_batch.unpersist()
    raise last_err  # exhausted retries under concurrent ingests
