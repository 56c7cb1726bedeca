from .ingest import run_available_now, streaming_extract, streaming_turn_metrics  # noqa: F401
from .stateful import streaming_sessionize  # noqa: F401
