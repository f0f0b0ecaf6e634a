from .windows import (
    abandoned_views,
    sessionize,
    sessionize_windows,
    view_purchase_funnel,
    windowed_event_stats,
)

__all__ = [
    "windowed_event_stats",
    "sessionize",
    "sessionize_windows",
    "view_purchase_funnel",
    "abandoned_views",
]
