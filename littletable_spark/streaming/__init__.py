from .events import load_events, tumbling_window, sliding_window, sessionize
from .stateful import running_totals_stream
