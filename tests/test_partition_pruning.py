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
