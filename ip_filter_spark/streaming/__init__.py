from ip_filter_spark.streaming.sketch_stream import (
    merged_sketches_from_store,
    stream_sketch_build,
    windowed_event_counts,
)

__all__ = ["stream_sketch_build", "merged_sketches_from_store", "windowed_event_counts"]
