from no_jvm_wap_with_iceberg_spark.sources.registry import (
    TESTDATA_TABLES,
    load_table,
    register_views,
)

__all__ = ["TESTDATA_TABLES", "load_table", "register_views"]
