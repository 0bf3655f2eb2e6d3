"""Incrementally-maintained aggregate tables (materialized views).

The lakehouse pattern the change data feed exists for: a downstream
aggregate table (``SELECT key, COUNT(*), SUM(col)... GROUP BY key``)
kept in sync with its source at a cost of O(changed data) per refresh
— never a recompute over the source table. The reference engine
recomputes its audit aggregates from scratch every cycle
(``/root/reference`` ``src/serverless/app.py:217-246``); at 100 TB a
full-recompute materialization is the single most expensive thing a
pipeline can schedule, and this class replaces it.

How a refresh works (all composition of existing primitives):

1. read the persisted source cursor (a snapshot id) from the
   AGGREGATE table's properties;
2. ``Catalog.read_changes(src, cursor, head)`` yields exactly the
   rows the source gained/lost since — each feed element costs only
   the files its commit touched;
3. the feed folds to per-key deltas in ONE shuffle:
   ``+row`` for inserts, ``-row`` for deletes (an update is a
   delete+insert pair, so it contributes its net change);
4. current values for ONLY the affected keys are read back (file
   skipping via a key ``IN`` predicate when the key set is small) and
   the new totals merge in via :meth:`Catalog.merge_rows` — groups
   whose count reaches zero are tombstoned;
5. the new cursor rides IN the merge commit
   (``merge_rows(set_properties=...)``, one CAS) — the cursor and the
   rows it produced are atomic, so a crash anywhere leaves either the
   old consistent state or the new one, never half.

Determinism: sums are stored as DECIMAL columns and deltas aggregate
in decimal space, so "incremental" is BIT-IDENTICAL to "recompute
from scratch" on any partitioning — asserted by the
``catalog_incremental_agg`` oracle and tests/test_pipelines.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from no_jvm_wap_with_iceberg_spark.catalog import Catalog, Predicate

_CURSOR_PROP = "incr_src_cursor"
_SUM_TYPE = "decimal(18,2)"
_KEY_HINT_CAP = 10_000


class IncrementalAggregate:
    """``dst = SELECT key, COUNT(*) AS n_rows, SUM(expr) AS name...
    FROM src GROUP BY key`` — maintained incrementally.

    ``sum_cols`` maps output column name -> source SQL expression.
    ``key`` is the grouping/merge key of ``dst`` — one source column
    or a composite list (``merge_rows`` supports both); the key-IN
    file-skipping hint applies to the first component.
    """

    def __init__(
        self,
        cat: Catalog,
        src_table: str,
        dst_table: str,
        key: str | list[str],
        sum_cols: dict[str, str],
        branch: str = "main",
    ):
        self.cat = cat
        self.src = src_table
        self.dst = dst_table
        self.keys = [key] if isinstance(key, str) else list(key)
        self.sum_cols = dict(sum_cols)
        self.branch = branch

    # -- helpers --------------------------------------------------------
    def _aggregate(self, rows: DataFrame) -> DataFrame:
        return rows.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(F.expr(expr).cast(_SUM_TYPE)).alias(name)
                for name, expr in self.sum_cols.items()
            ],
        )

    # -- lifecycle ------------------------------------------------------
    def init(self, spark: SparkSession) -> int:
        """Create ``dst`` as the full aggregate of ``src`` at its
        current snapshot and persist that snapshot as the cursor.
        Re-running after a partial init is safe: the create is
        idempotent-by-error (drop the table to restart)."""
        if self.cat.table_exists(self.dst, self.branch):
            raise ValueError(
                f"{self.dst!r} exists; drop it (or call refresh) instead"
            )
        src_meta = self.cat.load_table(self.src, self.branch)
        head = src_meta.current_snapshot_id
        full = self._aggregate(self.cat.read(spark, self.src, self.branch))
        self.cat.create_table_from_df(full, self.dst, self.branch)
        self.cat.set_properties(
            self.dst, self.branch, **{_CURSOR_PROP: str(head)}
        )
        return head

    def refresh(self, spark: SparkSession) -> int:
        """Fold source changes since the cursor into ``dst``; returns
        the new cursor. A no-op (same cursor) when ``src`` is
        unchanged. Crash-safe: rows and cursor commit together."""
        dst_meta = self.cat.load_table(self.dst, self.branch)
        cursor = int(dst_meta.properties[_CURSOR_PROP])
        src_meta = self.cat.load_table(self.src, self.branch)
        head = src_meta.current_snapshot_id
        if head == cursor:
            return cursor

        feed = self.cat.read_changes(
            spark, self.src, cursor, head, self.branch
        )
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = feed.groupBy(*self.keys).agg(
            F.sum(sign).alias("__dn"),
            *[
                F.sum(F.expr(expr).cast(_SUM_TYPE) * sign).alias(f"__d_{name}")
                for name, expr in self.sum_cols.items()
            ],
        )
        # the delta feeds THREE consumers (key-hint collect, the
        # semi-join probe, the merge input); materialize it once so the
        # change-feed lineage — several joins over the touched files —
        # is not replayed per consumer. O(touched groups) rows.
        delta = delta.localCheckpoint(eager=True)

        # current totals for the AFFECTED groups only: broadcast the
        # delta key set as a semi-join, with a stats/bloom IN-hint when
        # it is small enough to collect (file skipping on 100 TB dst)
        keys_sample = (
            delta.select(*self.keys).limit(_KEY_HINT_CAP + 1).collect()
        )
        hint = (
            [Predicate("in", self.keys[0], [r[0] for r in keys_sample])]
            if len(keys_sample) <= _KEY_HINT_CAP
            else None
        )
        cur = self.cat.read(spark, self.dst, self.branch, predicates=hint).join(
            F.broadcast(delta.select(*self.keys)), self.keys, "left_semi"
        )

        merged = cur.join(delta, self.keys, "full")
        new_n = F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(
            F.col("__dn"), F.lit(0)
        )
        cdc = merged.select(
            *self.keys,
            new_n.alias("n_rows"),
            *[
                (
                    F.coalesce(
                        F.col(name), F.lit(0).cast(_SUM_TYPE)
                    )
                    + F.coalesce(
                        F.col(f"__d_{name}"), F.lit(0).cast(_SUM_TYPE)
                    )
                )
                .cast(_SUM_TYPE)
                .alias(name)
                for name in self.sum_cols
            ],
            (new_n == 0).alias("__gone"),
        )
        self.cat.merge_rows(
            cdc,
            self.dst,
            key=self.keys,
            branch=self.branch,
            delete_col="__gone",
            set_properties={_CURSOR_PROP: str(head)},
        )
        return head
