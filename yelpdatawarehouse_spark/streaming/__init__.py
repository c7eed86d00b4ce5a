from .pipeline import (  # noqa: F401
    EVENT_SCHEMA,
    batch_user_summary,
    bloom_filtered_stream,
    deduped_event_stream,
    event_file_stream,
    kafka_event_stream,
    parse_events_with_dlq,
    read_summary,
    run_incremental_summary,
    stateful_user_summary,
    windowed_type_counts,
)
from .yelp_consumer import (  # noqa: F401
    YELP_EVENT_SCHEMA,
    YelpStreamApplier,
    yelp_event_file_stream,
)
