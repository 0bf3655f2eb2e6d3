from no_jvm_wap_with_iceberg_spark.streaming.ingest import (
    dedup_within_watermark,
    follow_changes,
    stream_merge,
    stream_wap,
    windowed_event_counts,
)
from no_jvm_wap_with_iceberg_spark.streaming.changefeed_source import (
    backfill_then_stream,
    register_changefeed_source,
)
from no_jvm_wap_with_iceberg_spark.streaming.sessionize import (
    sessionize,
    sessionize_stream,
)

__all__ = [
    "backfill_then_stream",
    "dedup_within_watermark",
    "follow_changes",
    "register_changefeed_source",
    "sessionize",
    "sessionize_stream",
    "stream_merge",
    "stream_wap",
    "windowed_event_counts",
]
