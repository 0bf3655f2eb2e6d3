from no_jvm_wap_with_iceberg_spark.catalog.catalog import Catalog, CommitConflict
from no_jvm_wap_with_iceberg_spark.catalog.table import FileEntry, Snapshot, TableMetadata
from no_jvm_wap_with_iceberg_spark.catalog.pruning import Predicate, prune_files

__all__ = [
    "Catalog",
    "CommitConflict",
    "FileEntry",
    "Snapshot",
    "TableMetadata",
    "Predicate",
    "prune_files",
]
