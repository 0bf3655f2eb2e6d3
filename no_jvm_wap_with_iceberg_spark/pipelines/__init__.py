from no_jvm_wap_with_iceberg_spark.pipelines.curation import curate_documents

__all__ = ["curate_documents"]
