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


_asof_left = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),     # key
              st.integers(min_value=0, max_value=40)),   # ts
    min_size=1, max_size=20)
_asof_right = st.sets(
    st.tuples(st.integers(min_value=0, max_value=2),
              st.integers(min_value=0, max_value=40)),
    min_size=0, max_size=20)


@settings(max_examples=10, deadline=None)
@given(lrows=_asof_left, rkeys=_asof_right)
def test_asof_matches_python_replay(sp, lrows, rkeys):
    """Differential test: the union-and-carry as-of join equals a direct
    per-key Python replay (greatest right ts <= left ts, inclusive) on
    arbitrary key/timestamp soup, including duplicate left rows and
    unmatched keys."""
    from python_vector_db___ai_spark.operators.asof import asof_join

    left = sp.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "row_id long, key long, ts long")
    right = sp.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in sorted(rkeys)] or [(99, -1, 0)],
        "key long, ts long, payload long")
    got = {r.row_id: (r.asof_ts, r.asof_payload)
           for r in asof_join(left, right, on="key",
                              right_cols=["payload"]).collect()}
    assert set(got) == set(range(len(lrows)))
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, t in (sorted(rkeys) or [(99, -1)]):
        by_key.setdefault(k, []).append((t, k * 1000 + t))
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, p) for rt, p in by_key.get(k, []) if rt <= t]
        expected = max(cands) if cands else (None, None)
        assert got[i] == expected


@settings(max_examples=8, deadline=None)
@given(edges=st.sets(st.tuples(st.integers(min_value=0, max_value=6),
                               st.integers(min_value=0, max_value=6)),
                     min_size=0, max_size=12),
       n_nodes=st.integers(min_value=1, max_value=7))
def test_pagerank_matches_python_power_iteration(sp, edges, n_nodes):
    """Differential test: the join-per-round distributed PageRank
    equals a dense Python power iteration on random undirected graphs
    (self-loops dropped, out-of-spine endpoints ignored, isolated
    nodes held at the teleport floor)."""
    from python_vector_db___ai_spark.operators.graph import pagerank

    damping, iters = 0.85, 4
    e = [(i, j) for i, j in edges if i != j
         and i < n_nodes and j < n_nodes]
    nodes = sp.createDataFrame([(i,) for i in range(n_nodes)],
                               ["doc_id"])
    edf = (sp.createDataFrame(e or [(99, 98)], "i long, j long")
           .limit(len(e)))
    got = {r.doc_id: r.rank
           for r in pagerank(edf, nodes, iters=iters,
                             damping=damping).collect()}

    adj = {i: set() for i in range(n_nodes)}
    for i, j in e:
        adj[i].add(j)
        adj[j].add(i)
    rank = [1.0 / n_nodes] * n_nodes
    teleport = (1.0 - damping) / n_nodes
    for _ in range(iters):
        nxt = [teleport] * n_nodes
        for src, nbrs in adj.items():
            if nbrs:
                share = damping * rank[src] / len(nbrs)
                for dst in nbrs:
                    nxt[dst] += share
        rank = nxt
    assert set(got) == set(range(n_nodes))
    for i in range(n_nodes):
        assert got[i] == pytest.approx(rank[i], rel=1e-9, abs=1e-12)


_tm_events = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),    # user
              st.integers(min_value=0, max_value=10),   # ts offset
              st.sampled_from(["a", "b", "c"])),        # type
    min_size=0, max_size=20)


@settings(max_examples=10, deadline=None)
@given(evts=_tm_events)
def test_transition_matrix_matches_python_replay(sp, evts):
    """Differential test: the windowed bigram transition matrix equals
    a per-user Python replay over (ts, event_id)-sorted events,
    including duplicate timestamps resolved by the id tie-break."""
    from collections import Counter
    from datetime import datetime, timedelta

    from python_vector_db___ai_spark.operators.behavior import (
        transition_matrix,
    )

    base = datetime(2024, 1, 1)
    rows = [(i, u, base + timedelta(seconds=off), y)
            for i, (u, off, y) in enumerate(evts)]
    df = sp.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {(r.prev_type, r.cur_type): (r.n_transitions, r.p_next)
           for r in transition_matrix(df).collect()}

    counts: Counter = Counter()
    for u in {u for _, u, _, _ in rows}:
        seq = [y for ts, i, y in
               sorted((ts, i, y) for i, uu, ts, y in rows if uu == u)]
        counts.update(zip(seq, seq[1:]))
    by_prev: Counter = Counter()
    for (p, _), c in counts.items():
        by_prev[p] += c
    expected = {(p, c): (n, round(n / by_prev[p], 6))
                for (p, c), n in counts.items()}
    assert got == expected


@settings(max_examples=12, deadline=None)
@given(v=vec)
def test_quantize_int8_error_bounds(sp, v):
    """Absmax int8 quantization invariants on arbitrary vectors:
    scale == absmax/127 (1.0 for the all-zero vector), every
    reconstructed element within scale/2 of the original, and
    l2_error <= sqrt(d) * scale/2."""
    from python_vector_db___ai_spark.operators.embedding import quantize_int8

    df = sp.createDataFrame([(1, v)], ["vec_id", "embedding"])
    r = quantize_int8(df, round_to=12).first()
    mx = max(abs(x) for x in v)
    expected_scale = mx / 127.0 if mx > 1e-12 else 1.0
    assert r.scale == pytest.approx(expected_scale, rel=1e-9)
    half = expected_scale / 2
    assert r.max_abs_error <= half * (1 + 1e-9) + 1e-12
    assert r.l2_error <= math.sqrt(len(v)) * half * (1 + 1e-9) + 1e-12


def test_quantize_int8_rejects_colliding_columns(sp):
    """The operator adds scale/l2_error/max_abs_error — a pre-existing
    column of any of those names (or a staging temporary) must raise,
    not be silently overwritten."""
    from python_vector_db___ai_spark.operators.embedding import quantize_int8

    df = sp.createDataFrame([(1, [1.0, 2.0], 9.9)],
                            ["vec_id", "embedding", "scale"])
    with pytest.raises(ValueError, match="scale"):
        quantize_int8(df)


_rank_lists = st.dictionaries(
    st.integers(min_value=0, max_value=2),               # query_id
    st.tuples(st.permutations(list(range(8))),           # system-A order
              st.permutations(list(range(8)))),          # system-B order
    min_size=1, max_size=3)


@settings(max_examples=10, deadline=None)
@given(ranks=_rank_lists, cut_a=st.integers(min_value=1, max_value=8),
       cut_b=st.integers(min_value=1, max_value=8))
def test_rrf_fusion_matches_python(sp, ranks, cut_a, cut_b):
    """Differential test: rrf_fuse_batch equals a Python RRF replay
    (1/(k0+rank) per system, missing docs contribute one term only,
    round-before-rank, ascending-id tie-break) on random rankings with
    asymmetric cutoffs, so each system retrieves docs the other missed."""
    from python_vector_db___ai_spark.operators.bm25 import rrf_fuse_batch

    k0, k = 60, 5
    a_rows = [(q, d, r + 1) for q, (pa, _) in ranks.items()
              for r, d in enumerate(pa[:cut_a])]
    b_rows = [(q, d, r + 1) for q, (_, pb) in ranks.items()
              for r, d in enumerate(pb[:cut_b])]
    schema = "query_id long, doc_id long, rank long"
    got = [(r.query_id, r.doc_id, r.rrf, r.rank)
           for r in rrf_fuse_batch(
               sp.createDataFrame(a_rows, schema),
               sp.createDataFrame(b_rows, schema),
               k0=k0, k=k).collect()]

    expected = []
    for q, (pa, pb) in ranks.items():
        ra = {d: r + 1 for r, d in enumerate(pa[:cut_a])}
        rb = {d: r + 1 for r, d in enumerate(pb[:cut_b])}
        fused = [(round((1.0 / (k0 + ra[d]) if d in ra else 0.0)
                        + (1.0 / (k0 + rb[d]) if d in rb else 0.0), 6), d)
                 for d in set(ra) | set(rb)]
        fused.sort(key=lambda p: (-p[0], p[1]))
        expected += [(q, d, s, r + 1)
                     for r, (s, d) in enumerate(fused[:k])]
    assert sorted(got) == sorted(expected)


_vocab = ["a", "B", "c", "D", "e"]
_doc = st.lists(st.sampled_from([w.lower() for w in _vocab]),
                min_size=0, max_size=8)
_corpus = st.lists(_doc, min_size=1, max_size=6)
_query = st.lists(st.sampled_from(_vocab + ["z"]), min_size=1, max_size=4)
_queries = st.lists(_query, min_size=1, max_size=3)


@settings(max_examples=10, deadline=None)
@given(corpus=_corpus, qs=_queries)
def test_bm25_batch_matches_python(sp, corpus, qs):
    """Differential test: bm25_scores_batch equals a pure-Python BM25
    replay (ln(1+(N-df+0.5)/(df+0.5)) idf, bag-of-terms query
    multiplicity, corpus-wide N/avgdl including empty docs) on random
    corpora and random query bags with case-folding and unseen terms."""
    from python_vector_db___ai_spark.operators.bm25 import bm25_scores_batch

    k1, b = 1.2, 0.75
    docs = sp.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string")
    qtable = sp.createDataFrame(list(enumerate(qs)),
                                "query_id long, terms array<string>")
    got = {(r.query_id, r.doc_id): r.bm25
           for r in bm25_scores_batch(docs, qtable, k1=k1, b=b).collect()}

    n = len(corpus)
    dls = [float(len(ws)) for ws in corpus]
    avgdl = sum(dls) / n
    tfs = [{w: ws.count(w) for w in set(ws)} for ws in corpus]
    expected = {}
    for qi, terms in enumerate(qs):
        from collections import Counter
        qtf = Counter(t.lower() for t in terms)
        for t, mult in qtf.items():
            df = sum(1 for tf in tfs if t in tf)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for d, tf in enumerate(tfs):
                if t not in tf:
                    continue
                denom = tf[t] + k1 * (1 - b + b * dls[d] / avgdl)
                expected[(qi, d)] = (expected.get((qi, d), 0.0)
                                     + mult * idf * tf[t] * (k1 + 1) / denom)
    assert set(got) == set(expected)
    for key, v in expected.items():
        assert got[key] == pytest.approx(v, rel=1e-9, abs=1e-12)


_activity = st.sets(st.tuples(st.integers(min_value=0, max_value=4),
                              st.integers(min_value=0, max_value=9)),
                    min_size=1, max_size=20)


@settings(max_examples=10, deadline=None)
@given(act=_activity, w=st.integers(min_value=1, max_value=4))
def test_rolling_active_users_matches_python(sp, act, w):
    """Differential test: rolling_active_users (bounded x window_days
    explode + one count-distinct, no day-range theta-join) equals a
    Python trailing-window replay on random (user, day) activity sets
    with gaps: dau counts the day's users, wau the trailing window's,
    days past the last observed day are clipped, and a report day
    appears iff some user was active in its window."""
    from datetime import datetime, timedelta

    from python_vector_db___ai_spark.operators.behavior import (
        rolling_active_users,
    )

    base = datetime(2024, 3, 1, 12, 0, 0)
    rows = [(i, u, base + timedelta(days=d, hours=u % 3), "x")
            for i, (u, d) in enumerate(sorted(act))]
    ev = sp.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r.day: (r.dau, r.wau, r.dau_wau_ratio)
           for r in rolling_active_users(ev, window_days=w).collect()}

    days = {d for _, d in act}
    lo, hi = min(days), max(days)
    expected = {}
    for r in range(lo, hi + 1):
        wau = len({u for u, d in act if r - w + 1 <= d <= r})
        if wau == 0:
            continue
        dau = len({u for u, d in act if d == r})
        day = (base + timedelta(days=r)).strftime("%Y-%m-%d")
        expected[day] = (dau, wau, round(dau / wau, 6))
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(act=_activity, cap=st.integers(min_value=0, max_value=9))
def test_retention_cohorts_matches_python(sp, act, cap):
    """Differential test: retention_cohorts equals a Python replay
    (cohort = each user's first active day, per-(cohort, offset)
    distinct-active counts, offsets capped at max_offset_days,
    retention = round(n_active/cohort_size, 6)) on random activity
    sets, including users whose whole tail falls past the cap."""
    from datetime import datetime, timedelta

    from python_vector_db___ai_spark.operators.behavior import (
        retention_cohorts,
    )

    base = datetime(2024, 3, 1, 12, 0, 0)
    rows = [(i, u, base + timedelta(days=d, hours=u % 3), "x")
            for i, (u, d) in enumerate(sorted(act))]
    ev = sp.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {(r.cohort_day, r.day_offset): (r.n_active, r.cohort_size,
                                          r.retention)
           for r in retention_cohorts(ev, max_offset_days=cap).collect()}

    first = {}
    for u, d in act:
        first[u] = min(first.get(u, d), d)
    sizes = {}
    for u, c in first.items():
        sizes[c] = sizes.get(c, 0) + 1
    cells = {}
    for u, d in act:
        off = d - first[u]
        if off <= cap:
            cells.setdefault((first[u], off), set()).add(u)
    expected = {}
    for (c, off), users in cells.items():
        day = (base + timedelta(days=c)).strftime("%Y-%m-%d")
        expected[(day, off)] = (len(users), sizes[c],
                                round(len(users) / sizes[c], 6))
    assert got == expected


_docs_pack = st.lists(
    st.tuples(st.integers(min_value=0, max_value=99),        # doc_id
              st.sampled_from(["web", "code", "wiki"]),      # source
              st.integers(min_value=1, max_value=500)),      # n_tokens
    min_size=1, max_size=25,
    unique_by=lambda t: t[0])


@settings(max_examples=10, deadline=None)
@given(docs=_docs_pack, budget=st.integers(min_value=1, max_value=800),
       n_shards=st.integers(min_value=1, max_value=4))
def test_pack_sequences_matches_python(sp, docs, budget, n_shards):
    """Differential test: pack_sequences equals a Python replay
    (shard = stable_hash64(id + ':shard') % n_shards via the
    parity-tested replica, per-(source, shard) id-ascending cumsum,
    seq_id = floor(preceding_tokens / budget)) on random corpora."""
    from python_vector_db___ai_spark.functions.pytext import (
        stable_hash64_py,
    )
    from python_vector_db___ai_spark.operators.packing import pack_sequences

    df = sp.createDataFrame(list(docs),
                            "doc_id long, source string, n_tokens long")
    got = {r.doc_id: (r.shard, r.seq_start_tok, r.seq_id)
           for r in pack_sequences(df, budget, n_shards=n_shards).collect()}

    shard = {d: stable_hash64_py(f"{d}:shard") % n_shards
             for d, _, _ in docs}
    expected = {}
    groups = {}
    for d, src, nt in sorted(docs):
        groups.setdefault((src, shard[d]), []).append((d, nt))
    for (_, sh), members in groups.items():
        cum = 0
        for d, nt in members:
            expected[d] = (sh, cum, cum // budget)
            cum += nt
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(docs=_docs_pack,
       w_web=st.floats(min_value=0.0, max_value=1.0),
       w_code=st.floats(min_value=0.0, max_value=1.0),
       seed=st.integers(min_value=0, max_value=3))
def test_sample_mixture_matches_python(sp, docs, w_web, w_code, seed):
    """Differential test: sample_mixture's hash gate equals the Python
    replay (stable_hash64(id + ':mix<seed>') % 1e6 < weight * 1e6,
    default weight for unlisted sources) on random corpora and random
    per-source weights, including 0.0 (drop all) and 1.0 (keep all)."""
    from python_vector_db___ai_spark.functions.pytext import (
        stable_hash64_py,
    )
    from python_vector_db___ai_spark.operators.packing import sample_mixture

    weights = {"web": w_web, "code": w_code}
    df = sp.createDataFrame(list(docs),
                            "doc_id long, source string, n_tokens long")
    got = sorted(r.doc_id for r in
                 sample_mixture(df, weights, seed=seed).collect())

    expected = sorted(
        d for d, src, _ in docs
        if stable_hash64_py(f"{d}:mix{seed}") % 1_000_000
        < int(weights.get(src, 1.0) * 1_000_000))
    assert got == expected


@pytest.mark.parametrize("seed", [0, 11])
def test_sketch_knn_matches_numpy_replay(sp, seed):
    """Differential test: the two-stage sketch tier — SRP sign bits
    packed to bigint words, per-partition Hamming top-L with
    (hamming, id) tie-break, global window, exact cosine re-rank —
    must equal a from-scratch NumPy replay (the hyperplanes are
    seed-reproducible, so the replay regenerates them independently)."""
    import numpy as np

    from python_vector_db___ai_spark.operators.lsh import sketch_knn

    rng = np.random.default_rng(seed)
    n, d, n_bits, L, k = 40, 16, 64, 10, 5
    V = rng.standard_normal((n, d))
    Qm = V[:3] + 0.05 * rng.standard_normal((3, d))

    corpus = sp.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    queries = sp.createDataFrame(
        [(100 + qi, [float(x) for x in Qm[qi]]) for qi in range(3)],
        "query_id long, query_vec array<double>")
    got = sketch_knn(queries, corpus, k=k, n_bits=n_bits, L=L,
                     seed=42).collect()

    H = np.random.default_rng(42).standard_normal((n_bits, d))
    cbits = V @ H.T > 0
    want = {}
    for qi in range(3):
        qbits = Qm[qi] @ H.T > 0
        ham = (qbits[None, :] != cbits).sum(axis=1)
        cand = sorted(range(n), key=lambda i: (ham[i], i))[:L]
        score = {
            i: round(float(V[i] @ Qm[qi])
                     / (np.linalg.norm(V[i]) * np.linalg.norm(Qm[qi])), 6)
            for i in cand}
        top = sorted(cand, key=lambda i: (-score[i], i))[:k]
        for rank, i in enumerate(top, start=1):
            want[(100 + qi, i)] = (score[i], rank)

    assert len(got) == 3 * k
    for r in got:
        ws, wr = want[(r.query_id, r.vec_id)]
        assert r.score == pytest.approx(ws, abs=1e-9)
        assert r.rank == wr
