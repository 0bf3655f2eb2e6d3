"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_query_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized via a count-style action (collect on
already-aggregated results) — the same work the correctness gate
does, so the number tracks real end-to-end query latency including
scan, shuffle, and Python-boundary costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from no_jvm_wap_with_iceberg_spark.session import get_spark
from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_orders",
    "window_top3_orders_per_customer",
    "events_hourly_rollup",
    "text_quality_profile",
    "dedup_minhash_lsh",
    "dedup_components",
    "similarity_cosine_topk",
    "asof_purchase_last_click",
    "events_sessionization",
    "corpus_decontaminate_eval",
    "embedding_pq_codes",
    "text_bpe_merge_candidates",
    # round 4: conditional MERGE INTO (write+merge+read cycle) and the
    # streaming changefeed draining a MERGE commit as row-level CDC
    "merge_into_conditional",
    "streaming_changefeed_merge",
    "events_session_window_native",
    # round 5: real-codec throughput (encode+decode round trips over
    # every document payload — the multimodal scan-shaped workload)
    "multimodal_bmp_decode",
    "multimodal_wav_frame_features",
    # round 5 late: whole-file metadata DELETE — a partitioned write +
    # boundary-aligned retention delete whose delete step is O(metadata)
    # (zero rows read/written); the row tracks the WRITE+commit cycle
    "catalog_metadata_delete",
    # round 6: ANN recall asserted AT BENCH SCALE (VERDICT r5 #6) —
    # the two rows-only ANN queries' parameter quality was previously
    # checked only at sf0.01; the bench loop now hard-asserts
    # recall_ok for lsh AND ivf at sf0.1 every run
    "similarity_ann_recall_gate",
    # round 6 late: the production corpus-ingest shape (3-batch
    # cross-batch dedup against the persisted fingerprint index,
    # atomic multi-table publish per batch) and the predicate-scoped
    # atomic reload (REPLACE WHERE: write + enforced replace +
    # read-back). Round 8: the index layout is now SELF-SIZING
    # (starts truncate(1), evolves by digest count, migrates old-era
    # files on each step) — the entry measures what a real bench-scale
    # corpus pays, not a layout sized for 10^7 digests (17.5-20.5 s
    # at the r7 fixed width 2 -> 5.7 s; probe soundness unchanged,
    # soak: affected 0 files across an evolution step, SCALE.md r8)
    "dedup_incremental_index",
    "sql_replace_where",
    # round 7: the two new assertion gates run (and hard-assert) at
    # bench scale like the ANN recall gate — simhash hamming-vs-exact-
    # Jaccard cohort agreement, and HLL/KLL sketch error bounds; plus
    # one of the TPC-H shapes the derived partsupp unblocked (Q2's
    # window-min over a broadcast dimension join)
    "dedup_simhash_agreement_gate",
    "sketch_events_error_gate",
    "q2_min_cost_supplier",
    # round 8: the NEAR-dup twin of dedup_incremental_index now rides
    # the bench too (3-batch ingest against the persisted MinHash
    # band+signature indexes, atomic 3-table publish per batch) so a
    # regression in either incremental pipeline shows up per-round
    "dedup_incremental_near",
    # round 9: the multi-table atomic append primitive (two
    # transactions x two tables each, one commit + one ref CAS per
    # transaction, concurrent per-table writes; the commit count is
    # hard-asserted inside the query itself)
    "catalog_append_many_txn",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="bench")
    queries = get_queries()

    # Warm-up pass at the smallest SF: pays JIT/codegen compilation and
    # Python-worker startup once, so the timed pass measures steady-state
    # query latency (what a long-running cluster actually sees), not
    # one-time JVM warmup. The warmup SF is tiny, so no data-level
    # caching of the measured inputs occurs.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        queries[name].spark(spark, warm_dir).collect()

    # three timed repetitions; report the MEDIAN per query (plus min
    # as a secondary key). The host is a shared VM with multi-second
    # single-run noise spikes — BENCH_r02 recorded a phantom 3.4 s
    # "regression" on q18 that a quiet re-run measured at 1.1 s.
    # Median-of-3 keeps one spike from polluting the headline number.
    reps: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # the canary re-runs as the FINAL entry of every rep: host drift
    # that accumulates DURING the run (shared VM) shows up as
    # end-canary/start-canary > 1, so each bench window adjudicates
    # its own noise instead of leaning on a front-only canary that
    # can't see mid-run slowdowns (VERDICT r10 #1: the official 1.12×
    # window whose biggest movers were untouched paths)
    canary = HEADLINE[0]
    canary_end: list[float] = []
    for _rep in range(3):
        # clear persisted intermediates so every rep measures the same
        # cold-cache work (minhash persists its signature table)
        spark.catalog.clearCache()
        for name in HEADLINE:
            t0 = time.time()
            rows = queries[name].spark(spark, sf_dir).collect()
            reps[name].append(time.time() - t0)
            if name == "similarity_ann_recall_gate":
                # quality assertion at bench scale: a recall
                # regression fails the bench run, not just sf0.01
                bad = [r["method"] for r in rows if not r["recall_ok"]]
                if bad:  # not assert: python -O must not strip the gate
                    raise RuntimeError(
                        f"ANN recall below bound at {sf_dir}: {bad}"
                    )
            elif name.endswith("_gate"):
                # every *_gate entry hard-asserts its boolean columns
                # at bench scale (simhash agreement, sketch bounds)
                bad = [
                    (i, k)
                    for i, r in enumerate(rows)
                    for k, v in r.asDict().items()
                    if isinstance(v, bool) and not v
                ]
                if bad:
                    raise RuntimeError(
                        f"{name} failed at {sf_dir}: {bad}"
                    )
        t0 = time.time()
        queries[canary].spark(spark, sf_dir).collect()
        canary_end.append(time.time() - t0)
    timings = {n: round(sorted(ts)[1], 3) for n, ts in reps.items()}
    timings_min = {n: round(min(ts), 3) for n, ts in reps.items()}

    # end-to-end WAP throughput: one full write->audit->publish cycle
    # on a 100k-row clean batch (the reference's entire engine is this
    # loop under a 900 s Lambda bound; ours runs it in seconds)
    import tempfile

    from no_jvm_wap_with_iceberg_spark.catalog import Catalog
    from no_jvm_wap_with_iceberg_spark.sources.datagen import generate_batch
    from no_jvm_wap_with_iceberg_spark.wap import NotNullCheck, WapPipeline

    with tempfile.TemporaryDirectory() as d:
        cat = Catalog(d)
        pipe = WapPipeline(cat, "bench_table", [NotNullCheck("my_col_1")])
        batch = generate_batch(spark, n=100_000, no_null=True)
        pipe.run_batch(spark, generate_batch(spark, n=1_000, no_null=True))  # warm
        t0 = time.time()
        res = pipe.run_batch(spark, batch)
        assert res.published
        timings["wap_cycle_100k"] = round(time.time() - t0, 3)

    # drift = end-canary / start-canary (median of 3 each, identical
    # query + data): ~1.0 means a quiet window; >1 means the host
    # slowed WHILE the bench ran, and per-entry moves up to the drift
    # factor are environment, not regression. Kept OUT of `queries`
    # so round-over-round common-set totals stay comparable.
    canary_start = sorted(reps[canary])[1]
    drift = round(sorted(canary_end)[1] / canary_start, 3)

    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_min": timings_min,
                "reps": 3,
                "canary": canary,
                "canary_end_sec": round(sorted(canary_end)[1], 3),
                "drift": drift,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
