"""Streaming ingest + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    modality_stats,
    resize_stub,
    to_multimodal,
)
from python_vector_db___ai_spark.session import load_table
from python_vector_db___ai_spark.streaming.ingest import (
    hourly_event_counts,
    read_events_stream,
    run_stream_to_completion,
)
from tests.conftest import SF_DIR


def test_stream_equals_batch(spark):
    # The micro-batch engine must produce the same windowed aggregation
    # as the batch planner over the same data.
    stream_res = run_stream_to_completion(
        hourly_event_counts(read_events_stream(spark, SF_DIR)),
        query_name="t_hourly")
    batch_res = hourly_event_counts(load_table(spark, SF_DIR, "events"))
    assert stream_res.count() == batch_res.count()
    diff = stream_res.exceptAll(batch_res)
    assert diff.count() == 0


def test_multimodal_roundtrip(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(30)
    mm = to_multimodal(docs)
    assert dict(mm.dtypes)["content"] == "binary"
    feats = decode_features(mm)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.features)
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert r.modality in ("image", "audio", "video")


def test_multimodal_decode_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(10)
    a = {r.doc_id: r.features
         for r in decode_features(to_multimodal(docs)).collect()}
    b = {r.doc_id: r.features
         for r in decode_features(to_multimodal(docs)).collect()}
    assert a == b


def test_multimodal_real_decoder_is_stubbed(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(1)
    with pytest.raises(NotImplementedError):
        decode_features(to_multimodal(docs), deterministic=False)


def test_resize_stub_records_target(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(3)
    out = resize_stub(to_multimodal(docs), target=224).collect()
    assert all(r.meta["resized_to"] == "224" for r in out)


def test_modality_stats_totals(spark):
    docs = load_table(spark, SF_DIR, "documents")
    stats = modality_stats(to_multimodal(docs)).collect()
    assert sum(r.n_items for r in stats) == docs.count()
