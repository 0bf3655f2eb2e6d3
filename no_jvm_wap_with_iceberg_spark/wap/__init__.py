from no_jvm_wap_with_iceberg_spark.wap.checks import (
    Check,
    CheckResult,
    ExpressionCheck,
    FreshnessCheck,
    NotNullCheck,
    RangeCheck,
    ReferentialIntegrityCheck,
    RowCountCheck,
    UniqueCheck,
)
from no_jvm_wap_with_iceberg_spark.wap.pipeline import WapPipeline, WapResult

__all__ = [
    "Check",
    "CheckResult",
    "ExpressionCheck",
    "FreshnessCheck",
    "NotNullCheck",
    "RangeCheck",
    "ReferentialIntegrityCheck",
    "RowCountCheck",
    "UniqueCheck",
    "WapPipeline",
    "WapResult",
]
