from .asof import asof_join
from .pit import entity_filter, latest_per_entity, project, temporal_filter, top_k_per_group

__all__ = [
    "asof_join",
    "entity_filter",
    "latest_per_entity",
    "project",
    "temporal_filter",
    "top_k_per_group",
]
