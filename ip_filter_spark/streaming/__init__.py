from ip_filter_spark.streaming.sketch_stream import (
    merged_heavy_hitters,
    merged_sketches_from_store,
    stream_heavy_hitters,
    stream_sketch_build,
    windowed_event_counts,
)
from ip_filter_spark.streaming.dedup import stream_exact_dedup
from ip_filter_spark.streaming.joins import interval_join, stream_interval_join
from ip_filter_spark.streaming.sessions import stream_session_stats
from ip_filter_spark.streaming.stateful import running_distinct_by_key

__all__ = [
    "stream_session_stats",
    "stream_sketch_build",
    "merged_sketches_from_store",
    "stream_heavy_hitters",
    "merged_heavy_hitters",
    "windowed_event_counts",
    "running_distinct_by_key",
    "stream_exact_dedup",
    "interval_join",
    "stream_interval_join",
]
