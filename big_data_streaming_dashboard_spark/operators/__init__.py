from .validate import validate_enrich
from .dedup import first_occurrence_dedup
from .route import route, split_routes
from .temporal import temporal_batch
from .analytics import grid_cluster, level_filter, recent_points, rolling_stats
from .alerts import alert_candidates, alert_cooldown

__all__ = [
    "alert_candidates",
    "alert_cooldown",
    "first_occurrence_dedup",
    "grid_cluster",
    "level_filter",
    "recent_points",
    "rolling_stats",
    "route",
    "split_routes",
    "temporal_batch",
    "validate_enrich",
]
