"""Central query registry.

Every implemented operator/query from SURVEY.md §2 registers here with:
  - a Spark builder:  (SparkSession, sf_dir) -> DataFrame   (DataFrame/SQL plan)
  - a DuckDB oracle:  ANSI SQL string over the same parquet views (or None for
    genuinely non-SQL-expressible ops — the driver then records a rows-only check)

`__spark_entry__.py` exposes this registry to the driver verbatim.

Column-name contract: the driver sorts columns by name before value-hashing, so the
Spark result and the oracle result must use IDENTICAL column names. Keep every
computed column aliased on both sides.

Float contract: double aggregates are rounded (ROUND n) on BOTH sides so that
engine-level summation-order noise (Spark partial/final agg trees vs DuckDB's
sequential sums) cannot flip a value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name {spec.name!r}")
    _REGISTRY[spec.name] = spec
    return spec


def query(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        register(QuerySpec(name=name, build=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags, bench=bench))
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (imports run the decorators).

    On a partial import failure the already-executed decorators are rolled
    back: without this, the NEXT call would re-import the failed module
    (Python evicts it from sys.modules) and die on 'duplicate query name',
    burying the real error under a registry artifact."""
    global _LOADED
    if _LOADED:
        return
    import sys

    snapshot = dict(_REGISTRY)
    modules_before = set(sys.modules)
    try:
        _load_modules()
    except BaseException:
        _REGISTRY.clear()
        _REGISTRY.update(snapshot)
        # Also evict the query modules THIS attempt imported: sys.modules
        # caches successfully-imported ones even when a sibling fails, so a
        # retry would skip their decorators and leave the rolled-back
        # registry silently missing their queries.
        for mod in set(sys.modules) - modules_before:
            if mod.startswith(f"{__package__}.queries"):
                del sys.modules[mod]
        raise
    _LOADED = True


def _load_modules() -> None:
    from .queries import (  # noqa: F401
        audit,
        taxi,
        tpch,
        events,
        text,
        dedup,
        similarity,
        sql_surface,
        sketches,
        fares,
        media,
        prep,
        streaming_parity,
        composed,
    )
