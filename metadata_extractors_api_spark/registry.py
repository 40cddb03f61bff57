"""Query registry: the single source of truth for the engine's operator surface.

Every operator from SURVEY.md §2.B is registered here as a named query
(callable ``(spark, sf_dir) -> DataFrame``) with, where expressible, a
DuckDB-equivalent ANSI SQL oracle string. ``__spark_entry__.py`` exposes
these to the driver.

Design notes (scale-first):
- Queries are pure plan builders: no ``collect()`` in the data path, no
  driver-side loops. Catalyst/AQE pick physical strategies.
- Every computed column is aliased identically in Spark and oracle SQL
  (the driver's hash compare sorts columns by name).
- Float aggregation drift is eliminated structurally: money columns are
  cast to exact DECIMAL before SUM/windowed SUM, then rounded and cast to
  DOUBLE, so Spark's parallel aggregation and DuckDB's sequential one
  produce bit-identical results regardless of association order.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (streaming / genuinely non-SQL-expressible ops only).
    """

    def deco(fn: QueryFn) -> QueryFn:
        # A repeated name would silently SHADOW the earlier query in
        # the driver's correctness sweep (this caught a real collision:
        # round 4 re-used round 2's join_null_safe). Fail loudly at
        # import instead.
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
