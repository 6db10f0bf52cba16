"""The IVF scale claim, demonstrated: a corpus written partitioned by
cluster_id lets the probe-join prune partitions at the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.crud import (
    format_results,
    query_history_stats,
)
from python_vector_db___ai_spark.plans.explain import formatted_plan
from python_vector_db___ai_spark.session import load_table
from tests.conftest import SF_DIR


def test_cluster_partitioned_corpus_prunes_scan(spark, tmp_path):
    out = str(tmp_path / "corpus_by_label")
    emb = load_table(spark, SF_DIR, "embeddings")
    emb.write.partitionBy("label").parquet(out)

    corpus = spark.read.parquet(out)
    pruned = corpus.filter(F.col("label").isin([2, 5, 7]))
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan
    # the scan must touch only the 3 probed clusters
    files = pruned.select(F.input_file_name()).distinct().collect()
    labels_touched = {f[0].split("label=")[1].split("/")[0] for f in files}
    assert labels_touched == {"2", "5", "7"}


def test_format_results_preview_and_flags(spark):
    df = spark.createDataFrame(
        [(1, "x" * 500, 0.9)], ["doc_id", "text", "score"])
    with_preview = format_results(df, preview_chars=100).first()
    assert len(with_preview.content_preview) == 100
    assert "text" not in format_results(df, include_content=False).columns
    assert "score" not in format_results(df, include_scores=False).columns


def test_query_history_stats(spark):
    log = spark.createDataFrame(
        [("q1", 0.05), ("q2", 0.05)], ["query_id", "retrieval_time"])
    s = query_history_stats(log).first()
    assert s.n_queries == 2
    assert s.avg_time_sec == pytest.approx(0.05)
    assert s.qps == pytest.approx(20.0)


def test_gated_udfs_raise_cleanly():
    import importlib.util

    from python_vector_db___ai_spark.functions.text import (
        nltk_sentences_udf,
        pdf_extract_udf,
        tiktoken_count_udf,
    )

    for spec, fn in [("tiktoken", tiktoken_count_udf),
                     ("nltk", nltk_sentences_udf),
                     ("PyPDF2", pdf_extract_udf)]:
        if importlib.util.find_spec(spec) is None:
            with pytest.raises(ImportError):
                fn()
        else:
            assert fn() is not None


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """The co-location claim, demonstrated: two tables bucketed on the
    join key join with ZERO Exchange operators — at 100 TB this is how
    the big equi-joins (postings ⋈ postings, corpus ⋈ assignment) run
    without moving either side.  A plain parquet join of the same data
    needs shuffles on both sides."""
    # managed tables land in the session's spark-warehouse dir; the
    # DROPs in the finally block delete the files again
    spark.sql("DROP TABLE IF EXISTS b_corpus")
    spark.sql("DROP TABLE IF EXISTS b_assign")
    emb = load_table(spark, SF_DIR, "embeddings")
    (emb.select("vec_id", "embedding")
     .write.bucketBy(8, "vec_id").sortBy("vec_id")
     .format("parquet").saveAsTable("b_corpus"))
    (emb.select("vec_id", "label")
     .write.bucketBy(8, "vec_id").sortBy("vec_id")
     .format("parquet").saveAsTable("b_assign"))
    try:
        # AQE off for a deterministic plan; broadcast off so the join
        # cannot cheat its way around the shuffle question.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_corpus").join(spark.table("b_assign"),
                                              "vec_id")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan[:3000]

        plain = (emb.select("vec_id", "embedding")
                 .join(emb.select("vec_id", "label"), "vec_id"))
        assert "Exchange" in formatted_plan(plain)

        # same rows either way
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_corpus")
        spark.sql("DROP TABLE IF EXISTS b_assign")
