"""Query registry: every implemented operator registers a named query and
(usually) a DuckDB-oracle SQL twin.

The driver contract (/root/repo/__spark_entry__.py) wants
``queries() -> {name: fn(spark, sf_dir) -> DataFrame}`` and
``oracle_sql() -> {name: ANSI SQL}``. Modules under ``plans/`` and
``operators/`` register here via the ``@query`` decorator; the package
__init__ imports them all so the registry is populated on import.

Rules enforced by convention (SURVEY.md §7 "discipline for the oracle"):
  - every computed column is aliased identically in Spark and SQL;
  - double aggregates are rounded (sum->2dp, avg/ratio->4dp+) on BOTH
    sides so accumulation-order ulps can't flip the value hash;
  - timestamps are surfaced as DATE (or truncated) — never raw ts;
  - NO top-level array/map output columns, ever: the driver's pandas
    canonicalizer sort_values()-hashes cells and dies on unhashable
    lists (round-1 ERRs). Explode to one row per element (posexplode +
    an index column) or array_join to a string — on BOTH sides;
  - any query without an expressible SQL twin registers oracle=None and
    gets the driver's weaker rows-only check.

Registration ORDER is part of the contract: the driver's correctness
harness checks only the FIRST 50 registered names, so the package
__init__ declares an explicit priority list via ``set_priority``;
``all_queries``/``all_oracles`` iterate priority-first.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}
_PRIORITY: list[str] = []


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name] with an optional oracle twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _ordered() -> dict[str, QuerySpec]:
    """Registry in priority-first order. Validates lazily (at read time,
    when every module has finished importing) so that importing an
    operator module directly — which triggers this package's __init__
    mid-way through the operator package's own init — can't fail on
    not-yet-registered priority names."""
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise ValueError(f"priority names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None
    }


def get_spec(name: str) -> QuerySpec:
    return _REGISTRY[name]


def registered_names() -> list[str]:
    """All registered names in raw registration (module-import) order —
    for building priority lists before ordering is finalized."""
    return list(_REGISTRY)


def oracle_names() -> set[str]:
    """Names that carry an oracle twin — raw registry view, usable while
    the priority list is in flux (no priority validation)."""
    return {n for n, s in _REGISTRY.items() if s.oracle is not None}


def set_priority(priority: list[str]) -> None:
    """Declare the names that must come first in ``all_queries()`` /
    ``all_oracles()`` iteration order. The driver's correctness harness
    oracle-checks only the first 50 names, so this list decides which
    operators get hard verification signal each round. Unknown names are
    rejected when the registry is READ (see _ordered), so a renamed
    query still fails loudly rather than silently falling out of the
    checked window."""
    if len(set(priority)) != len(priority):
        dupes = sorted({n for n in priority if priority.count(n) > 1})
        raise ValueError(f"duplicate names in priority list: {dupes}")
    _PRIORITY.clear()
    _PRIORITY.extend(priority)
