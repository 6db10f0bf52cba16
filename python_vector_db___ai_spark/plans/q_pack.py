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
