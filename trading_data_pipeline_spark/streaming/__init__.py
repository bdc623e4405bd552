from .jobs import stream_events, tumbling_stream

__all__ = ["stream_events", "tumbling_stream"]
