from movie_data_pipeline_spark.streaming.events import (  # noqa: F401
    hourly_event_stats_stream,
    sessionize,
    stream_dedup,
    stream_events,
)
