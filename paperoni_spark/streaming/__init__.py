from .windowed import run_streaming_window_counts, windowed_event_counts

__all__ = ["run_streaming_window_counts", "windowed_event_counts"]
