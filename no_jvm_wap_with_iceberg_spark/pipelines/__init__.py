from no_jvm_wap_with_iceberg_spark.pipelines.curation import curate_documents
from no_jvm_wap_with_iceberg_spark.pipelines.incremental import (
    IncrementalAggregate,
)

__all__ = ["IncrementalAggregate", "curate_documents"]
