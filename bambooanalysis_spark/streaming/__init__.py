from .windows import windowed_event_stats, sessionize

__all__ = ["windowed_event_stats", "sessionize"]
