from no_jvm_wap_with_iceberg_spark.catalog.catalog import (
    Catalog,
    CommitConflict,
    Transaction,
)
from no_jvm_wap_with_iceberg_spark.catalog.export import (
    duckdb_view_sql,
    export_manifest,
)
from no_jvm_wap_with_iceberg_spark.catalog.pruning import Predicate, prune_files
from no_jvm_wap_with_iceberg_spark.catalog.store import (
    InMemoryStore,
    LocalFSStore,
    RefStore,
)
from no_jvm_wap_with_iceberg_spark.catalog.table import (
    DeleteSpec,
    FileEntry,
    Snapshot,
    TableMetadata,
)
from no_jvm_wap_with_iceberg_spark.catalog.zorder import (
    column_bounds,
    zorder_key,
    zorder_key_py,
)

__all__ = [
    "Catalog",
    "CommitConflict",
    "DeleteSpec",
    "FileEntry",
    "InMemoryStore",
    "LocalFSStore",
    "Predicate",
    "RefStore",
    "Snapshot",
    "Transaction",
    "TableMetadata",
    "column_bounds",
    "duckdb_view_sql",
    "export_manifest",
    "prune_files",
    "zorder_key",
    "zorder_key_py",
]
