"""Named-query registry: the ``queries()`` / ``oracle_sql()`` contract.

Every operator the engine claims (SURVEY §2.3) registers here as a
callable ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible,
a DuckDB oracle string. ``__spark_entry__.py`` re-exports these to the
driver, which hash-compares Spark vs DuckDB at sf0.01.

Oracle-parity discipline (SURVEY §5.3 / §7.3), applied by helpers in
``common.py``:
- identical aliases on both sides;
- no raw timestamp/date outputs — format to strings on both sides;
- double aggregates via DECIMAL(18,4) accumulation (deterministic and
  engine-independent, unlike float summation order), cast back to double;
- deterministic ORDER BY tiebreakers on every LIMIT query;
- UTC session timezone everywhere.
"""

from __future__ import annotations

import functools
import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import ensure_semantic_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query, optionally with its DuckDB oracle.

    Queries with ``oracle=None`` get the driver's weaker rows-only check
    (non-deterministic or not SQL-expressible ops, SURVEY §2.3).
    """

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may pass a session built without the engine factory;
            # pin the semantics-critical confs (UTC, nanos parquet) per call.
            ensure_semantic_confs(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return wrapped

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        asof_pivot_sql,
        dedup,
        generators,
        joins,
        relational,
        setops,
        similarity,
        stats,
        subquery,
        text_analysis,
        windows,
    )
    from .functions import scalars, multimodal, udfs  # noqa: F401
    from .pipelines import star_schema  # noqa: F401
    from .streaming import stream_queries  # noqa: F401

    _LOADED = True


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
