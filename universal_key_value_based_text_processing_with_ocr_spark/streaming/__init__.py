"""Structured Streaming drive of the engine's plans (incremental batch)."""

from .incremental import streamed_events_window_agg, streamed_extraction_job
from .stateful import stateful_sessionize_stream
