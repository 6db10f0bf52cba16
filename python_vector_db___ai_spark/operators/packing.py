"""Training-mix assembly: weighted mixture sampling + sequence
packing (beyond the reference — the two steps between a cleaned
corpus and a token-budgeted training shard).

* :func:`sample_mixture` — deterministic weighted downsampling per
  source: keep a row iff ``stable_hash64(id) % 1e6 < weight * 1e6``.
  Hash-gated, not ``rand()``-gated, so the sample is reproducible
  across runs/engines (the DuckDB oracle replays it exactly) and
  stable under re-partitioning — the property a resumable pretraining
  pipeline needs.  Pure expressions: the filter pushes to the scan.
* :func:`pack_sequences` — fill fixed token-budget training sequences
  by cumulative token count within ``(source, shard)`` groups, where
  ``shard = stable_hash64(id) % n_shards``.  Packing inside bounded
  shards keeps the window partitions small and uniform (a global or
  per-source ordered cumsum would put one skewed key on one task at
  100×), and any partition of documents into shards is equally valid
  training input.  A document starting before a budget boundary
  finishes its sequence (bounded overflow of at most one document) —
  the standard best-effort document-level packing; token-level
  splitting is the chunkers' job (F11).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.hashing import stable_hash64

_SCALE = 1_000_000


def mixture_gate(id_col: Column, source: Column,
                 weights: Mapping[str, float],
                 default_weight: float = 1.0,
                 seed: int = 0) -> Column:
    """Boolean keep-gate: deterministic per-id hash under the source's
    sampling weight (0..1).  Exposed separately so audits can count
    would-be-kept rows without filtering."""
    h = stable_hash64(F.concat(id_col.cast("string"),
                               F.lit(f":mix{seed}"))) % _SCALE
    expr = None
    for src, w in sorted(weights.items()):
        cond = source == src
        keep = h < int(w * _SCALE)
        expr = F.when(cond, keep) if expr is None else expr.when(cond, keep)
    base = h < int(default_weight * _SCALE)
    return base if expr is None else expr.otherwise(base)


def sample_mixture(df: DataFrame, weights: Mapping[str, float],
                   default_weight: float = 1.0, seed: int = 0,
                   id_col: str = "doc_id",
                   source_col: str = "source") -> DataFrame:
    """Keep each row with its source's probability, deterministically."""
    return df.filter(mixture_gate(F.col(id_col), F.col(source_col),
                                  weights, default_weight, seed))


def pack_sequences(df: DataFrame, budget: int, n_shards: int = 8,
                   token_col: str = "n_tokens", id_col: str = "doc_id",
                   source_col: str = "source") -> DataFrame:
    """Assign each document to a training sequence within its
    ``(source, shard)`` group.

    Returns the input columns plus ``shard``, ``seq_id`` (0-based
    within the group), ``seq_start_tok`` (cumulative tokens before
    this doc in its group) — enough for a writer to emit one file per
    ``(source, shard, seq_id)``.  Deterministic: the in-group order is
    ``id_col`` ascending.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = (stable_hash64(F.concat(F.col(id_col).cast("string"),
                                    F.lit(":shard"))) % n_shards).cast("int")
    w = (Window.partitionBy(source_col, "shard")
         .orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    out = (df.withColumn("shard", shard)
           .withColumn("seq_start_tok",
                       F.coalesce(F.sum(F.col(token_col)).over(w),
                                  F.lit(0)).cast("long"))
           .withColumn("seq_id",
                       F.floor(F.col("seq_start_tok") / budget)
                       .cast("long")))
    return out
