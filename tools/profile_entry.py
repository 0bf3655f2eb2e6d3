"""Per-Spark-job wall-clock profile of one registered query.

Runs the named query once warmed (sf0.001) and once timed at the given
sf_dir, then dumps every Spark job the timed run submitted — job id,
wall, description/call site — from the live AppStatusStore. Serialized
walls (jobs whose [submit, complete] windows do not overlap any other
job's) are what a batch-small e2e entry actually pays, so the dump
orders by submission and marks overlap.

Usage: python tools/profile_entry.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from no_jvm_wap_with_iceberg_spark.session import get_spark
from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"profile-{name}")
    q = get_queries()[name]

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    q.spark(spark, warm_dir).collect()
    spark.catalog.clearCache()

    store = spark.sparkContext._jsc.sc().statusStore()
    n0 = store.jobsList(None).size()
    t0 = time.time()
    q.spark(spark, sf_dir).collect()
    wall = time.time() - t0

    jobs = store.jobsList(None)
    rows = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() < n0:
            continue
        sub = j.submissionTime().get().getTime()
        comp = (
            j.completionTime().get().getTime()
            if j.completionTime().isDefined()
            else None
        )
        desc = j.description().get() if j.description().isDefined() else ""
        rows.append((j.jobId(), sub, comp, j.name()[:90], desc[:90]))
    rows.sort(key=lambda r: r[1])
    base = rows[0][1] if rows else 0
    total_job = 0.0
    print(f"\n=== {name}: wall {wall:.2f}s, {len(rows)} jobs ===")
    prev_end = None
    for jid, sub, comp, jname, desc in rows:
        dur = (comp - sub) / 1000.0 if comp else float("nan")
        total_job += dur if comp else 0.0
        gap = (sub - prev_end) / 1000.0 if prev_end is not None else 0.0
        overlap = "|" if prev_end is not None and sub < prev_end else " "
        prev_end = max(prev_end or comp or sub, comp or sub)
        label = desc or jname
        print(
            f"job {jid:>4}  +{(sub - base)/1000.0:7.2f}s  dur {dur:6.2f}s"
            f"  gap {gap:6.2f}s {overlap} {label}"
        )
    print(f"sum(job durations) = {total_job:.2f}s vs wall {wall:.2f}s")


if __name__ == "__main__":
    main()
