"""Time a subset of registered queries, bench-style, for paired A/B runs.

Same methodology as bench.py (warm pass at sf0.001, clearCache between
reps, wall per entry) but over only the named entries so a tree-vs-tree
comparison completes in minutes. Prints one JSON line per rep and a
final summary line with per-entry median and min.

Usage: python tools/ab_entries.py <reps> <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from no_jvm_wap_with_iceberg_spark.session import get_spark
from no_jvm_wap_with_iceberg_spark.plans.registry import get_queries


def main() -> None:
    n_reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-entries")
    queries = get_queries()

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        queries[name].spark(spark, warm_dir).collect()

    reps: dict[str, list[float]] = {n: [] for n in names}
    for _rep in range(n_reps):
        spark.catalog.clearCache()
        rep_row = {}
        for name in names:
            t0 = time.time()
            queries[name].spark(spark, sf_dir).collect()
            dt = round(time.time() - t0, 3)
            reps[name].append(dt)
            rep_row[name] = dt
        print(json.dumps({"rep": _rep, **rep_row}), flush=True)

    summary = {
        n: {
            "median": round(sorted(ts)[len(ts) // 2], 3),
            "min": round(min(ts), 3),
            "all": ts,
        }
        for n, ts in reps.items()
    }
    print(json.dumps({"summary": summary, "sf_dir": sf_dir}), flush=True)


if __name__ == "__main__":
    main()
