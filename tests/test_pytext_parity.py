"""Randomized cross-engine parity for the Python replicas in
``functions/pytext.py``.

The round-7 map-only Arrow passes (SimHash, MinHash signing, repetition
metrics) only stay oracle-correct while the Python primitives replay
the JVM expression semantics BIT-EXACTLY.  The hand-picked edge cases
live next to each operator's differential test; this module hammers the
primitives with a seeded random corpus that deliberately mixes the
divergence hazards: unicode whitespace (NBSP, LINE SEPARATOR — Java's
``\\s`` must NOT split on them), ASCII control chars below 0x20 (VT/FF
DO split), surrogate-free emoji, case-folding targets, and exact .5
rounding boundaries.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.hashing import stable_hash64
from python_vector_db___ai_spark.functions.pytext import (
    java_ws_split,
    round_half_up,
    stable_hash64_py,
    word_shingles_py,
)
from python_vector_db___ai_spark.operators.dedup import (
    word_shingles,
    words_col,
)

_ALPHABET = (
    list("abcXYZ09.,!?'\"-_/") +
    [" ", "\t", "\n", "\x0b", "\f", "\r",          # ASCII \s — split
     "\xa0", " ", " ", "　",          # unicode ws — keep
     "\x01", "\x1f",                                # control — keep
     "é", "ß", "İ", "Σ", "ς", "中", "🦊"])          # case/width hazards


def _random_texts(n: int, seed: int = 1234) -> list[str]:
    rng = random.Random(seed)
    texts = []
    for _ in range(n):
        length = rng.choice([0, 1, 2, 5, 20, 80])
        texts.append("".join(rng.choice(_ALPHABET) for _ in range(length)))
    return texts


def test_java_ws_split_and_shingles_parity(spark):
    texts = _random_texts(400)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = df.select(
        "id",
        words_col(F.col("text")).alias("words"),
        word_shingles(F.col("text"), 1).alias("sh1"),
        word_shingles(F.col("text"), 3).alias("sh3")).collect()
    for r in got:
        t = texts[r.id]
        assert r.words == java_ws_split(t), repr(t)
        assert r.sh1 == word_shingles_py(t, 1), repr(t)
        assert r.sh3 == word_shingles_py(t, 3), repr(t)


def test_stable_hash64_parity(spark):
    texts = [t for t in _random_texts(200, seed=99) if t]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = df.select(
        "id",
        stable_hash64(F.col("text")).alias("h0"),
        stable_hash64(F.col("text"), seed=7).alias("h7")).collect()
    for r in got:
        t = texts[r.id]
        assert r.h0 == stable_hash64_py(t), repr(t)
        assert r.h7 == stable_hash64_py(t, seed=7), repr(t)


def test_round_half_up_parity(spark):
    rng = random.Random(4321)
    vals = [round(rng.uniform(0, 2), 8) for _ in range(300)]
    # exact .5-at-6-decimals boundaries, the half-even/half-up trap
    vals += [0.0000005, 0.1234565, 1.9999995, 0.5e-6 * 3]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double")
    got = df.select("id", F.round(F.col("v"), 6).alias("r")).collect()
    for r in got:
        assert r.r == round_half_up(vals[r.id]), vals[r.id]
