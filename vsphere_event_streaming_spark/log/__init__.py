from .model import (
    assign_offsets,
    get_start,
    last_page,
    log_range,
    ordered_replay,
    point_lookup,
    probe_offsets,
    replay_from,
    retention_filter,
)
from .service import EventLogService

__all__ = [
    "EventLogService",
    "assign_offsets",
    "get_start",
    "last_page",
    "log_range",
    "ordered_replay",
    "point_lookup",
    "probe_offsets",
    "replay_from",
    "retention_filter",
]
