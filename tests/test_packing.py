"""Mixture sampling + sequence packing invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.packing import (
    pack_sequences,
    sample_mixture,
)
from python_vector_db___ai_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def toks(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return docs.select(
        "doc_id", "source",
        F.size(F.filter(F.split(F.col("text"), r"\s+"),
                        lambda w: w != "")).cast("long")
        .alias("n_tokens")).cache()


def test_sample_mixture_weights_and_determinism(toks):
    weights = {"src0": 0.5, "src1": 0.0}
    a = {r.doc_id for r in sample_mixture(toks, weights).collect()}
    b = {r.doc_id for r in sample_mixture(toks, weights).collect()}
    assert a == b                         # hash-gated, not rand()-gated
    by_src = {r.source: r for r in
              (sample_mixture(toks, weights)
               .groupBy("source").count().collect())}
    assert "src1" not in by_src           # weight 0 -> dropped entirely
    n0 = toks.filter(F.col("source") == "src0").count()
    if "src0" in by_src and n0 >= 10:
        # ~half kept; loose bounds, deterministic given the seed
        assert 0.2 * n0 <= by_src["src0"]["count"] <= 0.8 * n0
    full = toks.filter(~F.col("source").isin("src0", "src1")).count()
    kept_full = sum(r["count"] for s, r in by_src.items()
                    if s not in ("src0", "src1"))
    assert kept_full == full              # default weight 1.0 keeps all


def test_sample_mixture_seed_changes_sample(toks):
    weights = {s: 0.5 for s in
               [r.source for r in toks.select("source").distinct().collect()]}
    a = {r.doc_id for r in sample_mixture(toks, weights, seed=0).collect()}
    b = {r.doc_id for r in sample_mixture(toks, weights, seed=1).collect()}
    assert a != b


def test_pack_sequences_cumsum_invariants(toks):
    budget = 256
    rows = pack_sequences(toks, budget=budget, n_shards=4).collect()
    assert len(rows) == toks.count()      # packing drops nothing
    groups = {}
    for r in rows:
        groups.setdefault((r.source, r.shard), []).append(r)
    for (src, sh), rs in groups.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        prev_seq = 0
        for r in rs:
            assert r.seq_start_tok == cum          # exact running total
            assert r.seq_id == cum // budget       # block assignment
            assert r.seq_id >= prev_seq            # non-decreasing
            prev_seq = r.seq_id
            cum += r.n_tokens
    # every sequence's token sum is bounded by budget + its last doc
    # (the bounded-overflow contract)
    seqs = {}
    for r in rows:
        seqs.setdefault((r.source, r.shard, r.seq_id), []).append(r)
    for key, rs in seqs.items():
        total = sum(r.n_tokens for r in rs)
        last = max(rs, key=lambda r: r.doc_id)
        assert total <= budget + last.n_tokens


def test_pack_sequences_rejects_bad_budget(toks):
    with pytest.raises(ValueError):
        pack_sequences(toks, budget=0)
