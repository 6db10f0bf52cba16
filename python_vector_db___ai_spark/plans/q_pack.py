"""Training-mix assembly query: deterministic weighted mixture
sampling + token-budget sequence packing over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.hashing import stable_hash_sql
from python_vector_db___ai_spark.operators.packing import (
    pack_sequences,
    sample_mixture,
)
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table

# Down-weight two sources, drop one, keep the rest — the typical
# mixture spec shape (weights are keep-probabilities).
_WEIGHTS = {"src0": 0.5, "src1": 0.25, "src2": 0.0}
_DEFAULT_W = 1.0
_BUDGET = 512
_SHARDS = 4
_SCALE = 1_000_000

_WORDS = ("list_filter(regexp_split_to_array(text, '\\s+'), "
          "w -> w <> '')")


def _mixture_pack_oracle() -> str:
    mix_h = stable_hash_sql("concat(doc_id, ':mix0')")
    shard_h = stable_hash_sql("concat(doc_id, ':shard')")
    cases = " ".join(
        f"WHEN source = '{s}' THEN {int(w * _SCALE)}"
        for s, w in sorted(_WEIGHTS.items()))
    return f"""
WITH toks AS (
  SELECT doc_id, source, len({_WORDS})::BIGINT AS n_tokens
  FROM documents
), kept AS (
  SELECT doc_id, source, n_tokens
  FROM toks
  WHERE ({mix_h} % {_SCALE})
        < (CASE {cases} ELSE {int(_DEFAULT_W * _SCALE)} END)
), sharded AS (
  SELECT doc_id, source, n_tokens,
         CAST({shard_h} % {_SHARDS} AS INT) AS shard
  FROM kept
)
SELECT doc_id, source, n_tokens, shard,
       coalesce(sum(n_tokens) OVER (
         PARTITION BY source, shard ORDER BY doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
         AS seq_start_tok,
       CAST(floor(coalesce(sum(n_tokens) OVER (
         PARTITION BY source, shard ORDER BY doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         / {_BUDGET}) AS BIGINT) AS seq_id
FROM sharded
"""


@register(
    "data_mixture_pack",
    oracle=_mixture_pack_oracle(),
    doc="training-mix assembly (beyond-reference pipeline op): "
        "hash-gated weighted mixture sampling per source "
        f"(reproducible, no rand(); weights {_WEIGHTS}, default "
        f"{_DEFAULT_W}) then token-budget sequence packing "
        f"(budget {_BUDGET}) by cumulative count within "
        f"(source, shard%{_SHARDS}) groups — bounded windows, no "
        "global ordered cumsum",
)
def data_mixture_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source",
        F.size(F.filter(F.split(F.col("text"), r"\s+"),
                        lambda w: w != "")).cast("long").alias("n_tokens"))
    kept = sample_mixture(toks, _WEIGHTS, default_weight=_DEFAULT_W)
    packed = pack_sequences(kept, budget=_BUDGET, n_shards=_SHARDS)
    return packed.select("doc_id", "source", "n_tokens", "shard",
                         "seq_start_tok", "seq_id")


_SPLIT_TRAIN = 80     # pmod(stable_hash64(doc_id), 100) < 80 -> train
_SPLIT_VAL = 90       # 80..89 -> val; 90..99 -> test


# Unregistered in round 7: now the 'split' branch of q_olap's melted
# ``data_health_report`` (registry consolidation, round-6 VERDICT #1).
SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT source, n_chars,
         CASE WHEN b < {_SPLIT_TRAIN} THEN 'train'
              WHEN b < {_SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT source, n_chars,
           {stable_hash_sql("CAST(doc_id AS VARCHAR)")} % 100 AS b
    FROM documents
  )
), per AS (
  SELECT split, source, count(*)::BIGINT AS n_docs,
         sum(n_chars)::BIGINT AS n_chars
  FROM assigned GROUP BY 1, 2
), tot AS (
  SELECT split, sum(n_docs) AS split_total FROM per GROUP BY split
)
SELECT p.split, p.source, p.n_docs, p.n_chars,
       round(p.n_docs * 1.0 / t.split_total, 6) AS share_of_split
FROM per p JOIN tot t ON t.split = p.split
"""


def dataset_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test assignment (md5-derived
    bucket, no rand() — replayable on any engine, stable under
    re-partitioning and re-runs) with a per-(split, source) balance
    report; the split column is a pure projection, so the assignment
    scales as a map-only pass at 100 TB."""
    from python_vector_db___ai_spark.functions.hashing import stable_hash64

    docs = load_table(spark, sf_dir, "documents")
    b = F.pmod(stable_hash64(F.col("doc_id").cast("string")), F.lit(100))
    assigned = docs.select(
        "source", "n_chars",
        F.when(b < _SPLIT_TRAIN, "train")
        .when(b < _SPLIT_VAL, "val")
        .otherwise("test").alias("split"))
    per = (assigned.groupBy("split", "source")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("n_chars")))
    tot = per.groupBy("split").agg(F.sum("n_docs").alias("split_total"))
    return (per.join(F.broadcast(tot), "split")
            .select("split", "source", "n_docs", "n_chars",
                    F.round(F.col("n_docs") / F.col("split_total"), 6)
                    .alias("share_of_split")))
