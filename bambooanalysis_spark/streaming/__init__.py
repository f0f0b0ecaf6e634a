from .windows import sessionize, view_purchase_funnel, windowed_event_stats

__all__ = ["windowed_event_stats", "sessionize", "view_purchase_funnel"]
