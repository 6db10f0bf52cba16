"""Streaming ingest + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    frame_sample,
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


def test_frame_sample_fans_out_video_rows(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(30)
    mm = to_multimodal(docs)
    frames = frame_sample(mm, max_frames=4)
    rows = frames.collect()
    video_ids = {r.doc_id for r in mm.filter(F.col("modality") == "video")
                 .collect()}
    assert {r.doc_id for r in rows} == video_ids       # only video fans out
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert 0.0 <= r.frame_feature <= 1.0
        assert r.frame_offset_ms % 40 == 0
    for frs in by_doc.values():
        assert 1 <= len(frs) <= 4
        assert sorted(f.frame_idx for f in frs) == list(range(len(frs)))
    # deterministic: same payload -> same frames
    again = frame_sample(mm, max_frames=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_frame_sample_real_decoder_is_stubbed(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(1)
    with pytest.raises(NotImplementedError):
        frame_sample(to_multimodal(docs), deterministic=False)


def test_modality_stats_totals(spark):
    docs = load_table(spark, SF_DIR, "documents")
    stats = modality_stats(to_multimodal(docs)).collect()
    assert sum(r.n_items for r in stats) == docs.count()
