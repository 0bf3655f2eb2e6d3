from no_jvm_wap_with_iceberg_spark.streaming.ingest import (
    stream_wap,
    windowed_event_counts,
)
from no_jvm_wap_with_iceberg_spark.streaming.sessionize import (
    sessionize,
    sessionize_stream,
)

__all__ = [
    "sessionize",
    "sessionize_stream",
    "stream_wap",
    "windowed_event_counts",
]
