"""Registry of driver-checkable queries.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for
genuinely non-SQL-expressible operators → rows-only check).

Conventions that keep the cross-engine value-hash stable:
* every float output column is ``round(x, N)`` in BOTH engines;
* every ranking rounds the score BEFORE ``row_number`` and tie-breaks on
  an id column;
* integer outputs are cast to BIGINT on the Spark side (DuckDB windows
  and counts default to BIGINT).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn
    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that register queries.
    from python_vector_db___ai_spark.plans import (  # noqa: F401
        q_ann,
        q_behavior,
        q_crud,
        q_dedup,
        q_extra,
        q_extra2,
        q_hybrid,
        q_metrics,
        q_misc,
        q_olap,
        q_pack,
        q_parity,
        q_pipeline,
        q_text,
        q_tokenize,
        q_vector,
        q_versioned,
    )
    return dict(_REGISTRY)
