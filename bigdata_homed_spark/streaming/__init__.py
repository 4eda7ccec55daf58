from .jobs import EVENTS_STREAM_SCHEMA, hourly_event_counts, run_stream_to_memory

__all__ = ["EVENTS_STREAM_SCHEMA", "hourly_event_counts", "run_stream_to_memory"]
