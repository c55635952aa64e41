"""Query plans: importing this package populates the registry."""

from . import parity  # noqa: F401
from .registry import all_oracles, all_queries, get_spec  # noqa: F401
