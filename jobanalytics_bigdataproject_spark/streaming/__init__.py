from jobanalytics_bigdataproject_spark.streaming.windows import (
    read_events_stream,
    json_props_extract,
    session_window_agg,
    sliding_window_agg,
    stream_from_directory,
    tumbling_window_agg,
    with_watermark,
)

__all__ = [
    "read_events_stream",
    "json_props_extract",
    "session_window_agg",
    "sliding_window_agg",
    "stream_from_directory",
    "tumbling_window_agg",
    "with_watermark",
]
