from crossbar_data_process_spark.streaming.pipelines import (
    stream_events,
    streaming_dedup,
    windowed_counts,
)

__all__ = ["stream_events", "streaming_dedup", "windowed_counts"]
