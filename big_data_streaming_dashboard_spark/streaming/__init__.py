from .pipeline import silver_stream, temporal_batch_stream
from .sinks import route_foreach_batch, run_to_memory

__all__ = [
    "route_foreach_batch",
    "run_to_memory",
    "silver_stream",
    "temporal_batch_stream",
]
