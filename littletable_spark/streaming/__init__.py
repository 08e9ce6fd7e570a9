from .events import (
    enrich_stream,
    load_events,
    sessionize,
    sliding_window,
    streaming_followup_join_demo,
    tumbling_window,
)
from .ingest import ingest_batch, start_curated_ingest
from .maintenance import asset_info, compact_asset, recover_asset
from .stateful import running_totals_stream
