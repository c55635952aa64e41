"""Query plans: importing this package populates the registry."""

from . import annotate, multimodal_plans, parity, relational, textops, timeseries  # noqa: F401
from ..operators import dedup, similarity  # noqa: F401
from .registry import all_oracles, all_queries, get_spec  # noqa: F401
