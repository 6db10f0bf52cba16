"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (exact batch kNN over the embeddings
table at sf0.001).  ``queries()`` / ``oracle_sql()`` — one entry per
implemented operator from SURVEY.md §2, backed by the registry in
``python_vector_db___ai_spark/plans/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from python_vector_db___ai_spark.plans.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact batch kNN (cosine/L2/dot) on /root/testdata/sf0.001."""
    qs = all_queries()
    return qs["knn_exact_batch"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
