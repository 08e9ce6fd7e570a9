from .events import (
    enrich_stream,
    load_events,
    sessionize,
    sliding_window,
    streaming_followup_join_demo,
    tumbling_window,
)
from .stateful import running_totals_stream
