"""Query plans: importing this package populates the registry."""

from . import (  # noqa: F401
    aggregates,
    annotate,
    cdc,
    llm_pipeline,
    multimodal_plans,
    parity,
    relational,
    textops,
    timeseries,
    tpch_extra,
    tpch_full,
)
from ..operators import (  # noqa: F401
    advanced_joins,
    components,
    dedup,
    kmeans,
    scale,
    similarity,
)
from .registry import all_oracles, all_queries, get_spec  # noqa: F401
