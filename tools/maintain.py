"""Table maintenance CLI: compact small files, expire old snapshots,
remove orphaned data files — the Iceberg housekeeping procedures
(rewrite_data_files / expire_snapshots / remove_orphan_files) over
this engine's catalog.

Usage:
    python tools/maintain.py WAREHOUSE TABLE [--keep-snapshots N]
                             [--target-file-mb M] [--delete-orphans]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from no_jvm_wap_with_iceberg_spark.catalog import Catalog  # noqa: E402
from no_jvm_wap_with_iceberg_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("warehouse")
    ap.add_argument("table")
    ap.add_argument("--keep-snapshots", type=int, default=3)
    ap.add_argument("--keep-commits", type=int, default=1000)
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--delete-orphans", action="store_true")
    ap.add_argument(
        "--orphan-grace-hours",
        type=float,
        default=3.0,
        help="skip unreferenced files younger than this (in-flight "
        "writer protection; 0 only when no concurrent writers exist)",
    )
    args = ap.parse_args()

    cat = Catalog(args.warehouse, create=False)
    spark = get_spark(app_name="maintain")

    before = len(cat.load_table(args.table).files())
    cat.compact(spark, args.table, target_file_mb=args.target_file_mb)
    after = len(cat.load_table(args.table).files())
    print(f"compact: {before} -> {after} files")

    cat.expire_snapshots(args.table, keep_last=args.keep_snapshots)
    print(f"expire: kept last {args.keep_snapshots} snapshots")

    orphans = cat.remove_orphan_files(
        args.table,
        dry_run=not args.delete_orphans,
        older_than_ms=int(args.orphan_grace_hours * 3_600_000),
    )
    verb = "deleted" if args.delete_orphans else "found (dry run)"
    print(f"orphans: {len(orphans)} {verb}")

    detached = cat.cut_history(keep_last=args.keep_commits)
    print(f"history: {detached} commits detached (keep {args.keep_commits})")

    meta_orphans = cat.gc_metadata(dry_run=not args.delete_orphans)
    print(f"metadata orphans: {len(meta_orphans)} {verb}")


if __name__ == "__main__":
    main()
