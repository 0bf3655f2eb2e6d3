"""Declarative audit-check library.

Generalizes the reference's swappable quality check — a single
``no nulls in my_col_1`` predicate (``src/serverless/app.py:182-232``;
the README invites "different quality tests depending on your need",
``README.md:157``) — into a small vocabulary of declarative checks
compiled to Spark DataFrame expressions.

Scale design:

- Checks that stats can answer are answered from **table metadata
  alone** (NotNullCheck fast path — zero data IO, exactly how Iceberg
  manifests let PyIceberg prune on null-count stats, SURVEY §4).
- Scan-based checks run against the **audited branch as committed**,
  not the in-memory batch — preserving the reference's deliberate
  re-read semantics (``src/serverless/app.py:197-203``).
- With ``incremental=True`` a pipeline audits only the files the new
  snapshot added — at 100 TB you audit the gigabytes you wrote, not
  the terabytes you already trust.
- Violation detection uses ``limit(1).isEmpty()``-style short
  circuits, never full materialization.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from no_jvm_wap_with_iceberg_spark.catalog.catalog import Catalog
from no_jvm_wap_with_iceberg_spark.catalog.pruning import Predicate
from no_jvm_wap_with_iceberg_spark.catalog.table import FileEntry


@dataclasses.dataclass
class CheckResult:
    check: str
    passed: bool
    detail: dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class AuditContext:
    """Everything a check may audit: the DataFrame slice plus the
    manifest entries behind it (for metadata-only fast paths).

    ``files_exact=False`` means the file stats over-approximate the
    audited rows (pending merge-on-read deletes): metadata fast paths
    must fall back to scanning ``df``, which has the deletes applied.
    """

    catalog: Catalog
    table: str
    branch: str
    df: DataFrame
    files: list[FileEntry]
    files_exact: bool = True


class Check:
    """Base: a check audits an AuditContext -> CheckResult.

    ``ctx.df`` is the DataFrame to audit (full table or the incremental
    slice); checks that can answer from ``ctx.files`` stats may skip
    reading it entirely.
    """

    name = "check"

    def run(self, ctx: AuditContext) -> CheckResult:  # pragma: no cover - abstract
        raise NotImplementedError

    # Pruning hints a pipeline may apply before scanning
    def predicates(self) -> list[Predicate]:
        return []


class NotNullCheck(Check):
    """Audit column(s) contain no NULLs — the reference's audit
    (``run_quality_checks``, ``src/serverless/app.py:182-232``).

    Fast path: per-file null-count stats from the snapshot manifest
    answer the check without any scan. Falls back to a short-circuit
    scan when stats are missing.
    """

    def __init__(self, *columns: str):
        self.columns = list(columns)
        self.name = f"not_null({','.join(columns)})"

    @staticmethod
    def _stats_nulls(files: list[FileEntry], column: str) -> int | None:
        total = 0
        for f in files:
            st = f.columns.get(column)
            if st is None or st.get("nulls") is None:
                return None
            total += st["nulls"]
        return total

    def run(self, ctx: AuditContext) -> CheckResult:
        detail: dict[str, Any] = {}
        need_scan: list[str] = []
        for c in self.columns:
            # stats over-approximate when MoR deletes are pending (a
            # delete may have removed exactly the null rows) -> scan
            nulls = self._stats_nulls(ctx.files, c) if ctx.files_exact else None
            if nulls is None:
                need_scan.append(c)
            else:
                detail[c] = {"nulls": nulls, "source": "metadata"}
        if need_scan:
            counts = ctx.df.select(
                [
                    F.count(F.when(F.col(c).isNull(), 1)).alias(c)
                    for c in need_scan
                ]
            ).collect()[0]
            for c in need_scan:
                detail[c] = {"nulls": counts[c], "source": "scan"}
        passed = all(v["nulls"] == 0 for v in detail.values())
        return CheckResult(self.name, passed, detail)

    def predicates(self):
        return [Predicate.is_null(c) for c in self.columns]


class RangeCheck(Check):
    """All non-null values of a column fall inside [lo, hi]."""

    def __init__(self, column: str, lo: Any = None, hi: Any = None):
        if lo is None and hi is None:
            raise ValueError("RangeCheck needs lo and/or hi")
        self.column, self.lo, self.hi = column, lo, hi
        self.name = f"range({column},[{lo},{hi}])"

    def run(self, ctx: AuditContext) -> CheckResult:
        cond: Column = F.lit(False)
        if self.lo is not None:
            cond = cond | (F.col(self.column) < F.lit(self.lo))
        if self.hi is not None:
            cond = cond | (F.col(self.column) > F.lit(self.hi))
        bad = ctx.df.filter(cond).limit(1).count()
        return CheckResult(self.name, bad == 0, {"violation_found": bad > 0})


class UniqueCheck(Check):
    """Key column(s) are unique across the audited rows.

    Implemented as a hash aggregation (map-side partial combine) with
    an early limit — no sort, one shuffle on the key.
    """

    def __init__(self, *columns: str):
        self.columns = list(columns)
        self.name = f"unique({','.join(columns)})"

    def run(self, ctx: AuditContext) -> CheckResult:
        dup = (
            ctx.df.groupBy(*self.columns)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .count()
        )
        return CheckResult(self.name, dup == 0, {"duplicate_found": dup > 0})


class RowCountCheck(Check):
    """Row count within [min_rows, max_rows] — answered from metadata
    when auditing a full table, else a cheap count on the slice."""

    def __init__(self, min_rows: int = 1, max_rows: int | None = None):
        self.min_rows, self.max_rows = min_rows, max_rows
        self.name = f"row_count(>={min_rows}{f',<={max_rows}' if max_rows else ''})"

    def run(self, ctx: AuditContext) -> CheckResult:
        n = (
            sum(f.rows for f in ctx.files)
            if ctx.files is not None and ctx.files_exact
            else ctx.df.count()
        )
        ok = n >= self.min_rows and (self.max_rows is None or n <= self.max_rows)
        return CheckResult(self.name, ok, {"rows": n})


class FreshnessCheck(Check):
    """max(ts_column) is within ``max_lag_seconds`` of ``now`` (or of a
    supplied reference time — deterministic for tests)."""

    def __init__(self, ts_column: str, max_lag_seconds: int, now: Any = None):
        self.ts_column, self.max_lag, self.now = ts_column, max_lag_seconds, now
        self.name = f"freshness({ts_column}<={max_lag_seconds}s)"

    def run(self, ctx: AuditContext) -> CheckResult:
        now = F.lit(self.now).cast("timestamp") if self.now is not None else F.current_timestamp()
        row = ctx.df.agg(
            F.max(F.col(self.ts_column)).alias("latest"),
            F.max(now).alias("now"),
        ).collect()[0]
        if row["latest"] is None:
            return CheckResult(self.name, False, {"latest": None})
        lag = (row["now"] - row["latest"]).total_seconds()
        return CheckResult(self.name, lag <= self.max_lag, {"lag_seconds": lag})


class ExpressionCheck(Check):
    """Arbitrary SQL predicate every row must satisfy — the fully
    general U1 extension point (any Spark SQL expression; Catalyst
    pushes it down like any filter)."""

    def __init__(self, sql_predicate: str, name: str | None = None):
        self.sql = sql_predicate
        self.name = name or f"expr({sql_predicate})"

    def run(self, ctx: AuditContext) -> CheckResult:
        bad = ctx.df.filter(~F.expr(self.sql)).limit(1).count()
        return CheckResult(self.name, bad == 0, {"violation_found": bad > 0})


class ReferentialIntegrityCheck(Check):
    """Every FK value in the audited slice must exist in a reference
    table **on the same branch** (so a WAP branch that appends both
    fact and dim rows audits consistently against its own state).

    Plan shape: left-anti join, short-circuited by ``limit(1)`` — at
    100 TB the dim side is broadcast when small and the probe stops at
    the first orphan.
    """

    def __init__(self, fk_col: str, ref_table: str, ref_col: str):
        self.fk_col, self.ref_table, self.ref_col = fk_col, ref_table, ref_col
        self.name = f"fk({fk_col} -> {ref_table}.{ref_col})"

    def run(self, ctx: AuditContext) -> CheckResult:
        ref = ctx.catalog.read(
            ctx.df.sparkSession, self.ref_table, ctx.branch
        ).select(F.col(self.ref_col).alias(self.fk_col)).distinct()
        orphans = (
            ctx.df.select(self.fk_col)
            .filter(F.col(self.fk_col).isNotNull())
            .join(ref, self.fk_col, "left_anti")
            .limit(1)
            .count()
        )
        return CheckResult(self.name, orphans == 0, {"orphan_found": orphans > 0})
