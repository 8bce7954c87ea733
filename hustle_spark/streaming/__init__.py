from .windows import (  # noqa: F401
    read_events_stream,
    run_streaming_batch,
    sliding_window_agg,
    session_window_agg,
    stream_static_enrich,
    stream_stream_attribution_join,
    streaming_dedupe,
    tumbling_window_agg,
)
