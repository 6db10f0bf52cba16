"""Multimodal column plumbing (training-data-pipeline surface).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each executor processes
whole record batches.  The decode kernels themselves are STUBS in this
container (no PIL/ffmpeg): ``deterministic=True`` produces md5-seeded
fake features with the real schema/partitioning/batch shape, and
``deterministic=False`` raises ``NotImplementedError`` where the real
library call belongs — the Spark-side plumbing is identical either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4

_FEATURE_SCHEMA = ("doc_id long, modality string, n_bytes long, "
                   "width int, height int, features array<double>")


def to_multimodal(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Wrap a text corpus as multimodal rows: payload = UTF-8 bytes,
    modality assigned round-robin — a stand-in for real image/audio
    ingest that exercises the binary-column path end-to-end."""
    modality = (F.when(F.col(id_col) % 3 == 0, "image")
                .when(F.col(id_col) % 3 == 1, "audio")
                .otherwise("video"))
    return docs.select(
        F.col(id_col),
        modality.alias("modality"),
        F.col(text_col).cast("binary").alias("content"),
        F.create_map(F.lit("source"), F.lit("synthetic"),
                     F.lit("codec"), modality).alias("meta"))


def _fake_decode(payload: bytes, modality: str) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder: md5-seeded dimensions + features.
    REAL IMPLEMENTATION SLOT: PIL.Image.open / soundfile.read /
    av.open go here when the libraries exist."""
    digest = hashlib.md5(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    features = [digest[2 + i] / 255.0 for i in range(FEATURE_DIM)]
    return width, height, features


def decode_features(mm: DataFrame, deterministic: bool = True) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    One Arrow batch in, one out; executors never materialize the whole
    partition, so payload size is bounded by batch size not partition
    size — the property that matters for 100-MB media blobs.
    """
    if not deterministic:
        raise NotImplementedError(
            "real decoders (PIL/ffmpeg/soundfile) are not available in "
            "this container; run with deterministic=True for the "
            "md5-seeded fake decode with identical plumbing")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p, m)
                       for p, m in zip(pdf["content"], pdf["modality"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": [len(p) for p in pdf["content"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "features": [d[2] for d in decoded],
            })

    return mm.mapInPandas(op, schema=_FEATURE_SCHEMA)


def resize_stub(mm: DataFrame, target: int = 224) -> DataFrame:
    """Resize slot: records the target dims in metadata; the byte
    transform is a passthrough until a real image lib exists."""
    return mm.withColumn(
        "meta",
        F.map_concat(F.col("meta"),
                     F.create_map(F.lit("resized_to"), F.lit(str(target)))))


_FRAME_SCHEMA = ("doc_id long, frame_idx long, frame_offset_ms long, "
                 "frame_bytes long, frame_feature double")


def frame_sample(mm: DataFrame, max_frames: int = 4,
                 deterministic: bool = True) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (the UDTF shape — a media blob fans out to frame rows that
    downstream per-frame featurizers consume).

    STUB KERNEL: frame count/offsets/features are md5-seeded from the
    payload. REAL IMPLEMENTATION SLOT: ``av.open(payload)`` +
    keyframe iteration goes here.  The Spark plumbing — mapInPandas
    fan-out, bounded Arrow batches, per-frame schema — is the real
    thing either way.
    """
    if not deterministic:
        raise NotImplementedError(
            "real frame decoding (PyAV/ffmpeg) is not available in this "
            "container; run with deterministic=True for the md5-seeded "
            "stub with identical plumbing")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx",
                                    "frame_offset_ms", "frame_bytes",
                                    "frame_feature")}
            for doc_id, payload, modality in zip(
                    pdf["doc_id"], pdf["content"], pdf["modality"]):
                if modality != "video":
                    continue
                digest = hashlib.md5(payload).digest()
                n = 1 + digest[6] % max_frames
                for i in range(n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset_ms"].append(
                        int(digest[(7 + i) % 16]) * 40)
                    rows["frame_bytes"].append(len(payload))
                    rows["frame_feature"].append(
                        digest[(8 + i) % 16] / 255.0)
            yield pd.DataFrame(rows)

    return mm.mapInPandas(op, schema=_FRAME_SCHEMA)


def modality_stats(mm: DataFrame) -> DataFrame:
    """Per-modality payload statistics over the binary column — pure
    expressions, no decode needed (the cheap metadata pass you run
    before committing to a full decode at scale)."""
    return (mm.groupBy("modality")
            .agg(F.count("*").cast("long").alias("n_items"),
                 F.sum(F.length("content")).cast("long").alias("total_bytes"),
                 F.round(F.avg(F.length("content")), 6).alias("avg_bytes"),
                 F.min(F.length("content")).cast("long").alias("min_bytes"),
                 F.max(F.length("content")).cast("long").alias("max_bytes")))
