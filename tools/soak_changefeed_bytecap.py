"""Byte-capped changefeed soak at sf0.1 (SCALE.md round-7, VERDICT
r6 #6): the functional grid tests cover op kinds; this measures the
MEMORY BOUND — a single mega-commit (one append landing the whole
sf0.1 lineitem as 10 files) drains in N micro-batches whose planned
byte totals never exceed budget + one file (the tip-over unit the
source must admit to make progress), and the spliced replay is
byte-identical to the unbounded plan.

Per batch it records the PLANNED bytes (sum of the file-scoped
partition sizes — exactly what one trigger materializes, i.e. the
executor-memory bound the cap exists to enforce) and a content hash;
the union hash must equal the uncapped replay's.

Usage: python tools/soak_changefeed_bytecap.py [budget_files]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from no_jvm_wap_with_iceberg_spark.catalog import Catalog  # noqa: E402
from no_jvm_wap_with_iceberg_spark.session import get_spark  # noqa: E402
from no_jvm_wap_with_iceberg_spark.sources.registry import load_table  # noqa: E402
from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (  # noqa: E402
    ChangeFeedStreamReader,
)


def rows_hash(reader, parts) -> tuple[int, str]:
    n, h = 0, hashlib.sha256()
    for p in parts:
        for rb in reader.read(p):
            for row in sorted(map(str, rb.to_pylist())):
                h.update(row.encode())
                n += 1
    return n, h.hexdigest()


def main() -> None:
    budget_files = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="soak_cf_bytecap")
    d = tempfile.mkdtemp(prefix="soak_cf_")
    try:
        cat = Catalog(d)
        li = load_table(spark, sf, "lineitem")
        cat.create_table("li", li.schema)
        cat.append(li.repartition(10), "li")  # ONE 10-file mega-commit
        meta = cat.load_table("li")
        files = meta.files()
        # partition plans carry ABSOLUTE paths; manifests are
        # warehouse-relative
        sizes = {os.path.join(d, f.path): f.bytes for f in files}
        budget = budget_files * max(sizes.values())
        head = meta.current_snapshot_id
        schema = T.StructType(
            li.schema.fields
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_snapshot_id", T.LongType()),
            ]
        )

        def mk(opts):
            return ChangeFeedStreamReader(
                schema,
                {
                    "warehouse": d,
                    "table": "li",
                    "startingoffsets": "earliest",
                    **opts,
                },
            )

        r = mk({"maxbytespertrigger": str(budget)})
        start = r.initialOffset()
        batches = []
        t0 = time.time()
        for _ in range(100):
            end = r.latestOffset()
            if end == start:
                break
            parts = r.partitions(start, end)
            planned = sum(sizes[p.path] for p in parts)
            batches.append((parts, planned))
            start = end
        drain_s = time.time() - t0
        worst = max(planned for _p, planned in batches)
        bound = budget + max(sizes.values())  # + the tip-over unit
        split_parts = [p for parts, _ in batches for p in parts]
        n_split, h_split = rows_hash(r, split_parts)
        r_all = mk({})
        full = r_all.partitions({"snapshot_id": 0}, {"snapshot_id": head})
        n_full, h_full = rows_hash(r_all, full)
        print(
            json.dumps(
                {
                    "sf_dir": sf,
                    "commit_files": len(files),
                    "commit_bytes": sum(sizes.values()),
                    "budget_bytes": budget,
                    "batches": len(batches),
                    "worst_batch_bytes": worst,
                    "bound_bytes": bound,
                    "bounded": worst <= bound,
                    "rows": n_split,
                    "union_byte_identical": (n_split, h_split)
                    == (n_full, h_full),
                    "drain_s": round(drain_s, 2),
                }
            )
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
