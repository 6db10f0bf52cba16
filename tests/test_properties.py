"""Property-based tests (hypothesis) for the vector and chunking
invariants the reference asserts inline (FIXTURES.md invariants)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.chunking import chunk_chars_fixed
from python_vector_db___ai_spark.operators.crud import upsert

finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)
vec = st.lists(finite, min_size=2, max_size=8)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(max_examples=15, deadline=None)
@given(v=vec)
def test_normalize_unit_norm_property(sp, v):
    # ||l2_normalize(v)|| == 1 for non-zero v; zero vectors untouched
    from python_vector_db___ai_spark.functions.vector import (
        l2_normalize,
        vec_norm,
    )
    df = sp.createDataFrame([(v,)], ["a"])
    n = df.select(vec_norm(l2_normalize(F.col("a"))).alias("n")).first().n
    expected = 0.0 if math.sqrt(sum(x * x for x in v)) < 1e-12 else 1.0
    assert n == pytest.approx(expected, abs=1e-6)


@settings(max_examples=15, deadline=None)
@given(v=vec, w=vec)
def test_cosine_bounds_and_symmetry(sp, v, w):
    from python_vector_db___ai_spark.functions.vector import cosine_similarity
    m = min(len(v), len(w))
    v, w = v[:m], w[:m]
    df = sp.createDataFrame([(v, w)], ["a", "b"])
    r = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("ab"),
                  cosine_similarity(F.col("b"), F.col("a")).alias("ba")).first()
    assert -1.0 - 1e-9 <= r.ab <= 1.0 + 1e-9
    assert r.ab == pytest.approx(r.ba, abs=1e-12)


@settings(max_examples=10, deadline=None)
@given(text=st.text(alphabet=st.characters(codec="ascii",
                                           exclude_characters="\x00"),
                    min_size=1, max_size=600),
       size=st.integers(min_value=10, max_value=100),
       overlap=st.integers(min_value=0, max_value=9))
def test_chunker_tiles_document(sp, text, size, overlap):
    # chunks reassemble the document: stripping each chunk's overlap
    # prefix and concatenating yields the original text
    df = sp.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(chunk_chars_fixed(df, size=size, overlap=overlap).collect(),
                  key=lambda r: r.chunk_id)
    rebuilt = rows[0].chunk_text + "".join(
        r.chunk_text[overlap:] for r in rows[1:])
    assert rebuilt == text
    assert rows[0].start_char == 0
    assert rows[-1].end_char == len(text)


@settings(max_examples=10, deadline=None)
@given(base_ids=st.sets(st.integers(min_value=0, max_value=20), min_size=1),
       upd_ids=st.sets(st.integers(min_value=0, max_value=20), min_size=1))
def test_upsert_key_algebra(sp, base_ids, upd_ids):
    # |upsert(base, upd)| == |base_ids ∪ upd_ids|; updated keys win
    base = sp.createDataFrame([(i, "base") for i in base_ids],
                              ["doc_id", "text"])
    upd = sp.createDataFrame([(i, "upd") for i in upd_ids],
                             ["doc_id", "text"])
    got = {r.doc_id: r.text for r in upsert(base, upd).collect()}
    assert set(got) == base_ids | upd_ids
    for i in upd_ids:
        assert got[i] == "upd"


@given(st.lists(st.lists(st.booleans(), min_size=128, max_size=128),
                min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_sketch_pack_unpack_roundtrip(bits):
    """Packing sign bits into int64 words and unpacking them is the
    identity, and Hamming distance via the 0/1 matmul identity equals
    the direct bit comparison."""
    import numpy as np

    from python_vector_db___ai_spark.operators.lsh import (
        _pack_bits,
        _unpack_bits,
    )

    B = np.array(bits, dtype=bool)
    words = _pack_bits(B)
    assert words.shape == (len(B), 2)            # 128 bits -> 2 words
    back = _unpack_bits(words, 128).astype(bool)
    assert (back == B).all()
    # Hamming via |q| + |c| - 2 q.c on {0,1} vectors == direct XOR count
    f = B.astype(np.float32)
    ham_mm = (f.sum(1)[:, None] + f.sum(1)[None, :] - 2.0 * (f @ f.T))
    ham_direct = (B[:, None, :] != B[None, :, :]).sum(-1)
    assert (ham_mm.astype(np.int64) == ham_direct).all()


_ev_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),    # user
              st.integers(min_value=0, max_value=30),   # ts offset (s)
              st.sampled_from(["a", "b", "c"])),        # type
    min_size=1, max_size=25)


@settings(max_examples=10, deadline=None)
@given(evts=_ev_strategy)
def test_funnel_matches_python_reference(sp, evts):
    """Differential test: the single-pass array-walk funnel equals a
    direct per-user Python replay of the strict-sequential semantics
    on arbitrary event soup (duplicate timestamps included)."""
    from datetime import datetime, timedelta

    from python_vector_db___ai_spark.operators.behavior import funnel_steps

    base = datetime(2024, 1, 1)
    rows = [(i, u, base + timedelta(seconds=off), y)
            for i, (u, off, y) in enumerate(evts)]
    df = sp.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    steps = ["a", "b", "c"]
    got = {r.step_order: r.n_users
           for r in funnel_steps(df, steps).collect()}

    # python replay: walk each user's (ts, type)-sorted events, fill
    # slot k when type matches and slot k-1 was strictly earlier
    expected = [0] * len(steps)
    users = {u for _, u, _, _ in rows}
    for u in users:
        seq = sorted((ts, y) for _, uu, ts, y in rows if uu == u)
        slots = [None] * len(steps)
        for ts, y in seq:
            for k, s in enumerate(steps):
                if (slots[k] is None and y == s
                        and (k == 0 or (slots[k - 1] is not None
                                        and slots[k - 1] < ts))):
                    slots[k] = ts
                    break
        for k in range(len(steps)):
            if slots[k] is not None:
                expected[k] += 1
    assert got == {k: expected[k] for k in range(len(steps))}
    # monotone: each step can only lose users
    assert all(got[k] >= got[k + 1] for k in range(len(steps) - 1))
