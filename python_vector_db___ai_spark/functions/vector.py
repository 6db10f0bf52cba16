"""Vector / similarity scalar functions as pure Column expressions.

Re-expresses the reference's NumPy kernels (SURVEY.md §2.3 V1-V5:
``day_2/noramalization.py:68-119``, ``day_5/day5_complete.py:92-113``,
``day_9/database/vector_ops.py:143-147``) as ``aggregate`` / ``zip_with``
/ ``transform`` higher-order functions.  These run inside whole-stage
codegen on the JVM — no Python round-trip — so a 100-TB scan of an
``array<float>`` column stays vectorized end-to-end.

All arithmetic is done in DOUBLE regardless of the storage type (the
test tables store float32) so results are deterministic and match the
DuckDB oracle bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Zero-norm guard matching the reference's epsilon
# (day_2/noramalization.py:74: vectors with norm < eps pass through).
_EPS = 1e-12


def _d(x: Column) -> Column:
    return x.cast("double")


def vec_dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (V2, day_2/noramalization.py:106).

    Left-fold over ``zip_with`` products — sequential in array order, so
    the floating-point result is reproducible.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: Column) -> Column:
    """L2 norm of an array column (day_2/noramalization.py:72)."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _d(x) * _d(x))
    )


def l2_normalize(a: Column) -> Column:
    """L2-normalize with zero-vector passthrough (V1,
    day_2/noramalization.py:68-79: ``v / max(norm, eps)``; zero vectors
    are returned unchanged).

    ``a`` and its norm are let-bound (``functions/expr.py``): the open
    form evaluated the producing expression of ``a`` once for the norm
    and AGAIN inside each ``transform``, and the norm itself was
    re-evaluated per element inside the division lambda (interpreted
    HOFs have no loop-invariant hoisting).  For a *computed* array —
    ``mock_embedding``'s 8 md5-derived components — that multiplied
    one md5 per component into O(dim²) md5s per row (measured: the
    embed-cache kernel spent 7.6 s of JVM CPU on 5k docs).  Values
    are identical; NULL flows through both forms the same way."""
    from python_vector_db___ai_spark.functions.expr import let

    return let(a, lambda arr: let(
        vec_norm(arr),
        lambda norm: F.when(norm > _EPS,
                            F.transform(arr, lambda x: _d(x) / norm))
        .otherwise(F.transform(arr, lambda x: _d(x)))))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity, 0.0 when either vector has zero norm (V3,
    day_2/noramalization.py:103-119)."""
    na, nb = vec_norm(a), vec_norm(b)
    return F.when((na > _EPS) & (nb > _EPS), vec_dot(a, b) / (na * nb)) \
            .otherwise(F.lit(0.0))


def cosine_distance(a: Column, b: Column) -> Column:
    """pgvector ``<=>`` = 1 - cosine (day_9/database/vector_ops.py:143-147)."""
    return F.lit(1.0) - cosine_similarity(a, b)


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance, pgvector ``<->`` (V4 input,
    day_5/day5_complete.py:105-113)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def inner_product(a: Column, b: Column) -> Column:
    """Plain inner product (alias of vec_dot for API parity)."""
    return vec_dot(a, b)


def neg_inner_product(a: Column, b: Column) -> Column:
    """pgvector ``<#>`` — negative inner product, smaller = more similar
    (V5, day_9/database/vector_ops.py:143-147)."""
    return -vec_dot(a, b)


def euclidean_similarity(a: Column, b: Column) -> Column:
    """``1 / (1 + l2_distance)`` similarity transform (V4,
    day_10/embedders/embedding_pipeline.py:189-192)."""
    return F.lit(1.0) / (F.lit(1.0) + l2_distance(a, b))


METRICS = {
    "cosine": cosine_similarity,
    "l2": l2_distance,
    "inner_product": inner_product,
    "neg_inner_product": neg_inner_product,
    "euclidean_similarity": euclidean_similarity,
}

# Metrics where larger = more similar; the rest sort ascending.
DESCENDING_METRICS = {"cosine", "inner_product", "euclidean_similarity"}
