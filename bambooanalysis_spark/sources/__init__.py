from .hep import build_hep_events, HEP_OBJECTS_SQL, HEP_EVENTS_SQL

__all__ = ["build_hep_events", "HEP_OBJECTS_SQL", "HEP_EVENTS_SQL"]
