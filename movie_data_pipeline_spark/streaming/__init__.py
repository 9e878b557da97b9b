from movie_data_pipeline_spark.streaming.events import (  # noqa: F401
    click_purchase_join_stream,
    enriched_event_stream,
    hourly_distinct_users_stream,
    hourly_event_stats_stream,
    session_window_stats_stream,
    sessionize,
    sliding_event_stats_stream,
    stream_dedup,
    stream_events,
    user_running_totals_stream,
)
from movie_data_pipeline_spark.streaming.sinks import (  # noqa: F401
    dedup_gate_batch_writer,
    mix_drift_batch_writer,
    simhash_gate_batch_writer,
    start_dedup_gate_stream,
    start_mix_drift_stream,
    start_simhash_gate_stream,
    start_upsert_stream,
    start_versioned_append_stream,
    upsert_batch_writer,
    versioned_append_writer,
)
