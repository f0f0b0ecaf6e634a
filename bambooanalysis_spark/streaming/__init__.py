from .windows import (
    abandoned_views,
    sessionize,
    view_purchase_funnel,
    windowed_event_stats,
)

__all__ = [
    "windowed_event_stats",
    "sessionize",
    "view_purchase_funnel",
    "abandoned_views",
]
