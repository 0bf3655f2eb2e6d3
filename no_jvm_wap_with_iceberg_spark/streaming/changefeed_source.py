"""A Structured Streaming SOURCE over catalog table commits.

PySpark 4's Python Data Source API lets the catalog's append feed be
a first-class ``readStream`` input::

    register_changefeed_source(spark)
    feed = (spark.readStream.format("wap_changefeed")
            .option("warehouse", wh).option("table", "events")
            .load())                       # user schema + _change_type,
                                           # _snapshot_id

so watermarked windows, stateful operators, and sinks consume table
commits directly — no polling loop, offsets and restarts handled by
the engine's checkpoint.

Design (Spark-first, scale-first):

- **Offsets are snapshot ids** — the commit log IS the stream.
  ``latestOffset`` reads one small metadata JSON; no Spark job plans
  a micro-batch.
- **One input partition per (data file, snapshot)**: a micro-batch
  spanning N commits fans out to all their files in parallel;
  executors read parquet via pyarrow and emit Arrow record batches
  (zero row-at-a-time Python).
- **Schema-era mapping travels in the partition**: files written
  before a ``rename_column``/``add_column`` map by the recorded
  historical names, so the stream survives schema evolution
  mid-flight.
- **Append-only scope, loudly enforced**: appends (and layout-only
  compaction/z-order commits, which are skipped — layout is not
  change) stream; a span containing row-level deletes/updates raises
  with a pointer to :meth:`Catalog.read_changes` /
  :func:`follow_changes`, whose join-based replay semantics need the
  full engine. This matches the dominant streaming case — WAP-
  ingested tables are append-only between maintenance commits — and
  refuses, rather than corrupts, on the rest.

``startingOffsets``: ``"latest"`` (default — stream only commits
after the query starts), ``"earliest"`` (replay from table
creation), or a snapshot id.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        snapshot_id: int,
        arrow_schema_bytes: bytes,
        col_sources: list[tuple[str, list[str]]],
    ):
        self.path = path
        self.snapshot_id = snapshot_id
        self.arrow_schema_bytes = arrow_schema_bytes
        self.col_sources = col_sources  # (target name, candidate file names)


class ChangeFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.warehouse = options["warehouse"]
        self.table = options["table"]
        self.branch = options.get("branch", "main")
        self.starting = options.get("startingoffsets", "latest")
        self._spark_schema = schema  # user schema + feed columns

    # -- metadata helpers (driver-side, O(one JSON read)) --------------
    def _meta(self):
        from no_jvm_wap_with_iceberg_spark.catalog import Catalog

        return Catalog(self.warehouse).load_table(self.table, self.branch)

    def initialOffset(self) -> dict:
        if self.starting == "earliest":
            return {"snapshot_id": 0}
        if self.starting != "latest":
            return {"snapshot_id": int(self.starting)}
        head = self._meta().current_snapshot_id
        return {"snapshot_id": head if head is not None else 0}

    def latestOffset(self) -> dict:
        head = self._meta().current_snapshot_id
        return {"snapshot_id": head if head is not None else 0}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        meta = self._meta()
        lo, hi = start["snapshot_id"], end["snapshot_id"]
        span = [
            s
            for s in sorted(meta.snapshots, key=lambda s: s.snapshot_id)
            if lo < s.snapshot_id <= hi
        ]
        user_fields = [
            f for f in self._spark_schema.fields
            if f.name not in ("_change_type", "_snapshot_id")
        ]
        import pyspark.sql.types as T

        arrow_schema = to_arrow_schema(T.StructType(user_fields))
        schema_bytes = arrow_schema.serialize().to_pybytes()
        hist = meta.rename_history
        col_sources = [
            (f.name, [f.name] + list(hist.get(f.name, ())))
            for f in user_fields
        ]
        parts: list[InputPartition] = []
        for s in span:
            if s.operation in ("overwrite", "rewrite") and s.summary.get(
                "cdc"
            ) == "none":
                continue  # compaction/z-order: layout, not change
            if s.operation != "append" or s.deletes:
                raise ValueError(
                    f"snapshot {s.snapshot_id} is a {s.operation!r} commit; "
                    "the streaming changefeed source is append-only — "
                    "consume row-level deletes/updates with "
                    "Catalog.read_changes / follow_changes"
                )
            for f in s.added_files:
                parts.append(
                    _FilePartition(
                        os.path.join(self.warehouse, f.path),
                        s.snapshot_id,
                        schema_bytes,
                        col_sources,
                    )
                )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        """Executor-side: one parquet file -> Arrow record batches in
        the target schema (+ feed columns). Pure pyarrow — no Spark,
        no per-row Python."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = pa.ipc.read_schema(
            pa.py_buffer(partition.arrow_schema_bytes)
        )
        table = pq.read_table(partition.path)
        n = table.num_rows
        cols = []
        for name, candidates in partition.col_sources:
            fld = target.field(name)
            src = next(
                (c for c in candidates if c in table.column_names), None
            )
            if src is None:
                cols.append(pa.nulls(n, type=fld.type))
            else:
                cols.append(table.column(src).cast(fld.type))
        cols.append(pa.array(["insert"] * n, type=pa.string()))
        cols.append(pa.array([partition.snapshot_id] * n, type=pa.int64()))
        out_schema = pa.schema(
            list(target)
            + [
                pa.field("_change_type", pa.string()),
                pa.field("_snapshot_id", pa.int64()),
            ]
        )
        yield from pa.Table.from_arrays(cols, schema=out_schema).to_batches()

    def commit(self, end: dict) -> None:
        pass  # checkpoint owns progress; the table log needs no ack

    def stop(self) -> None:
        pass


class ChangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wap_changefeed"

    def schema(self):
        from pyspark.sql import types as T

        from no_jvm_wap_with_iceberg_spark.catalog import Catalog

        meta = Catalog(self.options["warehouse"]).load_table(
            self.options["table"], self.options.get("branch", "main")
        )
        return T.StructType(
            meta.spark_schema.fields
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_snapshot_id", T.LongType()),
            ]
        )

    def streamReader(self, schema) -> ChangeFeedStreamReader:
        return ChangeFeedStreamReader(schema, dict(self.options))


def register_changefeed_source(spark) -> None:
    """Idempotently register the ``wap_changefeed`` streaming format
    on a session."""
    spark.dataSource.register(ChangeFeedDataSource)
