"""Physical-plan assertions: the scale properties this repo claims
(pushdown, pruning, broadcast, shuffle counts) are tested, not assumed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.chunking import chunk_chars_fixed
from python_vector_db___ai_spark.operators.crud import get_by_ids
from python_vector_db___ai_spark.operators.search import knn_join, knn_join_blas
from python_vector_db___ai_spark.plans.explain import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    scan_read_schemas,
)
from python_vector_db___ai_spark.session import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    # Other test modules may have cached this table; a cache hit would
    # replace the parquet scan with InMemoryTableScan and hide the
    # pruning/pushdown behavior these tests assert.
    spark.catalog.clearCache()
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_point_lookup_pushes_filter(docs):
    plan_filters = pushed_filters(get_by_ids(docs, [3, 17]))
    assert any("doc_id" in f and ("In(" in f or "EqualTo" in f)
               for f in plan_filters), plan_filters


def test_knn_blas_prunes_corpus_scan(emb, spark):
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = knn_join_blas(q, emb, k=5, corpus_id="vec_id")
    schemas = scan_read_schemas(out)
    # the corpus-side scan must not read the unused `label` column
    assert any("embedding" in s and "label" not in s for s in schemas), schemas


def test_knn_expr_broadcasts_queries(emb):
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = knn_join(q, emb, k=5, corpus_id="vec_id")
    assert has_broadcast_join(out)


def test_chunker_has_no_shuffle(docs):
    out = chunk_chars_fixed(docs, size=200, overlap=50)
    assert count_exchanges(out) == 0, formatted_plan(out)


def test_metadata_filter_pushdown(docs):
    filtered = docs.filter(F.col("lang") == "en").select("doc_id")
    plan_filters = pushed_filters(filtered)
    assert any("lang" in f for f in plan_filters), plan_filters


def test_text_profile_has_no_window(spark):
    """text_profile's per-lang stats must be an aggregation broadcast
    back onto the rows — a window over the skewed low-cardinality lang
    key would put most of the corpus in one task at scale."""
    from python_vector_db___ai_spark.plans.queries import all_queries

    df = all_queries()["text_profile"].spark_fn(
        spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df)
    assert "Window" not in plan, plan[:2000]
    assert has_broadcast_join(df)


def test_bm25_topk_is_take_ordered(docs):
    """BM25 global top-k must be TakeOrderedAndProject (distributed
    partial top-k) — not an unpartitioned Window over every scored
    document, which funnels the full postings output through one task
    at scale.  The rank window may only run over the <= k survivors
    (so no WindowGroupLimit rewrite of a rank<=k filter either)."""
    from python_vector_db___ai_spark.operators.bm25 import bm25_topk

    out = bm25_topk(docs, ["fast", "key"], k=10)
    plan = formatted_plan(out)
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert "WindowGroupLimit" not in plan, plan[:3000]


def test_rrf_fuse_is_take_ordered(spark):
    from python_vector_db___ai_spark.operators.bm25 import rrf_fuse

    a = spark.range(100).select(F.col("id").alias("doc_id"),
                                (F.col("id") % 17 + 1).alias("rank"))
    b = spark.range(100).select(F.col("id").alias("doc_id"),
                                (F.col("id") % 13 + 1).alias("rank"))
    out = rrf_fuse(a, b, k=10)
    plan = formatted_plan(out)
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert "WindowGroupLimit" not in plan, plan[:3000]


def test_hnsw_merge_is_window_group_limit(emb):
    """The HNSW global merge is a per-query rank<=k filter, which must
    compile to WindowGroupLimit (each partition trims to k before the
    shuffle) — and the per-partition candidate rows are the only thing
    shuffled, never corpus vectors."""
    from python_vector_db___ai_spark.operators.hnsw import hnsw_knn

    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("query_vec")))
    out = hnsw_knn(q, emb, k=5, n_partitions=4)
    plan = formatted_plan(out)
    assert "WindowGroupLimit" in plan, plan[:3000]


def test_bm25_index_build_is_map_only(docs):
    """r13 (r12 ADVICE): per-doc term frequencies are computed as a
    pure expression over the sorted token array (run-length encode
    via sequence/filter/zip_with), so the in-flight dl-carrying index
    build plans ZERO exchanges and zero aggregates — the tf combine
    happens before any shuffle would be needed.  The r12 form paid
    one (doc, dl, term) groupBy exchange; the r8 form two."""
    from python_vector_db___ai_spark.operators.bm25 import bm25_index

    out = bm25_index(docs)
    assert count_exchanges(out) == 0
    assert "HashAggregate" not in formatted_plan(out)


def test_crossdoc_gram_exchange_uses_policy_partition_count(docs):
    """r10 (r9 VERDICT directive #2): the cross-doc gram aggregation
    sizes its own exchange — repartition(N, gkey) must satisfy the
    groupBy's required distribution (NO second exchange over the
    exploded relation appears), and the pinned count must land in the
    plan verbatim.  The solo-mass reduction per doc and the totals
    join keep their own (small) session-sized exchanges."""
    from python_vector_db___ai_spark.operators.quality import (
        crossdoc_dup_ngrams,
    )

    out = crossdoc_dup_ngrams(docs, n=8, shuffle_partitions=7)
    plan = formatted_plan(out)
    assert "hashpartitioning(gkey" in plan and ", 7)" in plan, plan[:3000]
    # the gkey relation is exchanged exactly once: only the explicit
    # repartition, no agg-induced re-shuffle of the gram positions
    # (formatted plans put the Exchange header and its Arguments on
    # separate lines, so count the partitioning-spec lines)
    assert sum(1 for ln in plan.splitlines()
               if "Arguments: hashpartitioning(gkey" in ln) == 1


def test_crossdoc_auto_policy_sizes_from_gram_count(docs, spark):
    """"auto" counts gram positions once and clamps N to
    [defaultParallelism, 4096]; plan_info records the decision."""
    import math

    from python_vector_db___ai_spark.operators.quality import (
        GRAMS_PER_PARTITION,
        crossdoc_dup_ngrams,
    )

    info: dict = {}
    crossdoc_dup_ngrams(docs, n=8, plan_info=info)
    par = spark.sparkContext.defaultParallelism
    want = min(max(par, math.ceil(info["total_grams"]
                                  / GRAMS_PER_PARTITION)), 4096)
    assert info["shuffle_partitions"] == want
    assert info["total_grams"] > 0


def test_decontaminate_broadcasts_benchmark_side(docs):
    """The n-gram decontamination join must broadcast the (fixed-size)
    benchmark postings — the training side is then one explode with a
    map-side join, never a corpus-sized shuffle of training shingles
    (the 100-TB shape the dedup sweep times per factor)."""
    from python_vector_db___ai_spark.operators.dedup import decontaminate

    bench = docs.limit(100).select(
        (F.col("doc_id") + 10 ** 9).alias("doc_id"), "text")
    assert has_broadcast_join(decontaminate(docs, bench, n=5))


def test_session_excludes_infer_filters_from_generate(spark):
    """Regression pin for the r10 3x-generator fix: the session factory
    must keep InferFiltersFromGenerate excluded — reintroducing it
    makes every computed explode generator (shingles, n-gram keys,
    postings, chunk structs) evaluate three times per row (the
    inferred size/isnotnull filter below the Generate, interpreted:
    lambda expressions don't codegen, so no CSE)."""
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    assert "InferFiltersFromGenerate" in excluded

    from python_vector_db___ai_spark.operators.dedup import (
        hashed_word_shingles,
    )

    docs = spark.createDataFrame([(1, "a b c d e f g h")],
                                 "doc_id long, text string")
    out = docs.select(F.explode(
        hashed_word_shingles(F.col("text"), 5)).alias("sh"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Filter" not in plan.split("Generate")[1], plan[:2000]


def test_shingle_lambdas_are_let_bound(docs):
    """r11: interpreted HOF lambdas re-evaluate any referenced
    computed Column per element, so the n-gram slicing lambdas must
    read a LET-BOUND word array (functions/expr.py — the plan shows
    ``transform(array(filter(split(...``) rather than slicing the
    tokenization expression inline, which is O(words²) per doc
    (measured 9.9 → 4.3 s on the 250k-doc crossdoc explode alone).
    Guards word_shingles / hashed_word_shingles / crossdoc's key
    builder / span_dedup's span builder against a refactor quietly
    reverting the binding."""
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.operators.dedup import (
        hashed_word_shingles,
        word_shingles,
    )
    from python_vector_db___ai_spark.operators.quality import (
        crossdoc_dup_ngrams,
    )
    from python_vector_db___ai_spark.operators.substring import span_dedup

    frames = [
        docs.select(F.explode(word_shingles(F.col("text"), 3)).alias("s")),
        docs.select(F.explode(hashed_word_shingles(F.col("text"), 5))
                    .alias("s")),
        crossdoc_dup_ngrams(docs, n=8, shuffle_partitions=None),
        span_dedup(docs, window=10),
    ]
    for df in frames:
        plan = formatted_plan(df).replace(" ", "")
        # string-keyed builders bind the word array; hashed-keyed
        # builders (r15) bind the word-HASH array — either way the
        # slicing lambda reads a let-bound array, never re-evaluating
        # the tokenization (or re-hashing words) per gram position.
        assert ("transform(array(filter(split(" in plan
                or "transform(array(transform(filter(split(" in plan), \
            plan[:2000]
