"""Branch quality dashboard — CLI parity with the reference's
Streamlit app (``src/quality_app.py``): row counts on main, row/null
counts for any branch (the forensic read path that closes the WAP
loop, reference :59-76).

Everything here is metadata-only (``Catalog.row_count`` /
``null_count`` answer from file stats) — zero Spark jobs, exactly the
scalability fix for the reference's load-a-column-into-RAM approach
(its acknowledged cliff, ``quality_app.py:49``).

Usage:
    python tools/dashboard.py WAREHOUSE_DIR TABLE [COLUMN ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from no_jvm_wap_with_iceberg_spark.catalog import Catalog  # noqa: E402


def report(warehouse: str, table: str, columns: list[str]) -> list[dict]:
    cat = Catalog(warehouse, create=False)
    rows = []
    for branch in cat.list_branches():
        if not cat.table_exists(table, branch):
            continue
        try:
            n = cat.row_count(table, branch)
        except ValueError:
            n = "mor-pending"  # exact count needs a scan; see row_count
        row = {
            "branch": branch,
            "rows": n,
            "snapshots": len(cat.load_table(table, branch).snapshots),
        }
        for c in columns:
            row[f"nulls({c})"] = cat.null_count(table, c, branch)
        rows.append(row)
    return rows


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    warehouse, table, columns = sys.argv[1], sys.argv[2], sys.argv[3:]
    rows = report(warehouse, table, columns)
    if not rows:
        print(f"table {table!r} not found on any branch")
        raise SystemExit(1)
    keys = list(rows[0])
    widths = {k: max(len(k), *(len(str(r[k])) for r in rows)) for k in keys}
    print("  ".join(k.ljust(widths[k]) for k in keys))
    for r in rows:
        print("  ".join(str(r[k]).ljust(widths[k]) for k in keys))


if __name__ == "__main__":
    main()
