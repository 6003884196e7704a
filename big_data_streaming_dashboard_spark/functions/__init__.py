from .levels import critical_flag, level3, level5, severity_map, severity_ws
from .keys import dedup_key
from .timeparse import normalize_event_time

__all__ = [
    "critical_flag",
    "dedup_key",
    "level3",
    "level5",
    "normalize_event_time",
    "severity_map",
    "severity_ws",
]
