"""Randomized differential tests for the corpus-dedup operators.

Each test replays the operator's documented semantics in plain Python
over hypothesis-generated corpora and demands exact agreement — the
same discipline test_properties.py applies to the behavioral and
retrieval operators.  The corpora draw words from a 4-token vocabulary
so cross-document n-gram collisions (the interesting case) are dense.

Covers the families whose plans were rewritten for scale in rounds
7-8 and until now were locked only by hand-computed fixtures + the
sf0.01 oracle: crossdoc_dup_ngrams (single-shuffle solo-mass form),
span_dedup (one-aggregate keeper), dedup_components (bounded-round
min-label propagation), decontaminate (postings equi-join).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings, strategies as st

from python_vector_db___ai_spark.functions.pytext import round_half_up

_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_word, min_size=0, max_size=10)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _mk_docs(sp, corpus):
    return sp.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string")


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(max_examples=10, deadline=None)
@given(corpus=_corpus)
def test_crossdoc_dup_ngrams_matches_python(sp, corpus):
    """The single-shuffle solo-mass form (round-8 plan) equals a direct
    Python count of positions whose n-gram occurs in >= 2 documents,
    and the xxhash64-keyed default equals the exact-string form."""
    from python_vector_db___ai_spark.operators.quality import (
        crossdoc_dup_ngrams,
    )

    n = 2
    docs = _mk_docs(sp, corpus)
    got = {r.doc_id: r for r in crossdoc_dup_ngrams(docs, n=n).collect()}
    exact = {r.doc_id: r
             for r in crossdoc_dup_ngrams(docs, n=n,
                                          exact_strings=True).collect()}

    owners: dict[tuple, set] = {}
    for i, ws in enumerate(corpus):
        for p in range(max(len(ws) - n + 1, 0)):
            owners.setdefault(tuple(ws[p:p + n]), set()).add(i)
    assert set(got) == set(range(len(corpus)))
    for i, ws in enumerate(corpus):
        grams = [tuple(ws[p:p + n])
                 for p in range(max(len(ws) - n + 1, 0))]
        dup = sum(1 for g in grams if len(owners[g]) >= 2)
        r = got[i]
        assert (r.n_grams, r.dup_grams) == (len(grams), dup)
        want = round_half_up(dup / len(grams), 6) if grams else 0.0
        assert r.crossdoc_dup_frac == pytest.approx(want, abs=1e-12)
        e = exact[i]
        assert (e.n_grams, e.dup_grams, e.crossdoc_dup_frac) == \
            (r.n_grams, r.dup_grams, r.crossdoc_dup_frac)


@settings(max_examples=10, deadline=None)
@given(corpus=_corpus, window=st.integers(min_value=1, max_value=4))
def test_span_dedup_matches_python(sp, corpus, window):
    """The one-aggregate keeper (min struct(doc_id, span_id) per span
    key) equals a global-first-occurrence replay, down to the residual
    md5 of each document's surviving text."""
    from python_vector_db___ai_spark.operators.substring import span_dedup

    docs = _mk_docs(sp, corpus)
    got = {r.doc_id: r for r in span_dedup(docs, window=window).collect()}

    spans_by_doc = {}
    keeper: dict[str, tuple] = {}
    for i, ws in enumerate(corpus):
        n_spans = math.ceil(len(ws) / window)
        spans = [" ".join(ws[s * window:(s + 1) * window])
                 for s in range(n_spans)]
        spans_by_doc[i] = spans
        for sid, sp_text in enumerate(spans):
            if (i, sid) < keeper.get(sp_text, (len(corpus), 0)):
                keeper[sp_text] = (i, sid)

    assert set(got) == set(range(len(corpus)))
    for i, spans in spans_by_doc.items():
        kept = [s for sid, s in enumerate(spans) if keeper[s] == (i, sid)]
        dropped = [s for sid, s in enumerate(spans) if keeper[s] != (i, sid)]
        r = got[i]
        assert r.n_spans == len(spans)
        assert r.n_dropped == len(dropped)
        assert r.words_dropped == sum(len(s.split(" ")) for s in dropped)
        assert r.chars_dropped == sum(len(s) for s in dropped)
        assert r.residual_hash == hashlib.md5(
            " ".join(kept).encode()).hexdigest()


@settings(max_examples=10, deadline=None)
@given(edges=st.sets(
    st.tuples(st.integers(min_value=0, max_value=5),
              st.integers(min_value=0, max_value=5)),
    min_size=0, max_size=10))
def test_dedup_components_matches_union_find(sp, edges):
    """With a round budget >= the graph diameter bound (|V| - 1, so
    propagation must converge), the min-label components equal a
    union-find ground truth: component_id is the member minimum, sizes
    match, exactly the minimum is canonical, and the convergence flag
    reports True."""
    from python_vector_db___ai_spark.operators.dedup import dedup_components

    n = 6
    edges = {(i, j) for i, j in edges if i != j}
    ids = sp.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = sp.createDataFrame(list(edges), "i long, j long")
    out = dedup_components(pairs, ids, rounds=n - 1).collect()

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in edges:
        parent[find(i)] = find(j)
    comp_min: dict[int, int] = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    members: dict[int, list] = {}
    for v in range(n):
        members.setdefault(comp_min[find(v)], []).append(v)

    assert len(out) == n
    for row in out:
        want_cid = comp_min[find(row.doc_id)]
        assert row.component_id == want_cid
        assert row.component_size == len(members[want_cid])
        assert row.is_canonical == (row.doc_id == want_cid)
        assert row.converged is True


@settings(max_examples=8, deadline=None)
@given(corpus=st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "Σ"]),
                                min_size=0, max_size=8),
                       min_size=1, max_size=6),
       shingle_n=st.integers(min_value=1, max_value=2))
def test_minhash_signature_expr_matches_python(sp, corpus, shingle_n):
    """Third-angle lock on the r8 signing rewrite: the pure-expression
    signature (the shape the SQL oracles replicate, and the form the
    Arrow pass is row-equality-locked against in test_dedup) must equal
    an independent Python replay of the whole chain — md5 base hash,
    30-bit mask, Carter-Wegman affine maps mod 2^31-1, min over
    distinct shingles."""
    from python_vector_db___ai_spark.functions.hashing import (
        MINHASH_MASK,
        MINHASH_P,
        minhash_consts,
    )
    from python_vector_db___ai_spark.functions.pytext import (
        stable_hash64_py,
        word_shingles_py,
    )
    from python_vector_db___ai_spark.operators.dedup import (
        minhash_signature_expr,
    )

    k = 4
    docs = _mk_docs(sp, corpus)
    got = {r["_id"]: r for r in
           minhash_signature_expr(docs, num_hashes=k,
                                  shingle_n=shingle_n).collect()}
    consts = minhash_consts(k)
    assert set(got) == set(range(len(corpus)))
    for i, ws in enumerate(corpus):
        text = " ".join(ws)
        shingles = word_shingles_py(text, shingle_n)
        assert got[i].shingles == shingles
        if not shingles:
            assert list(got[i].sig) == [None] * k
            continue
        bases = [stable_hash64_py(s) & MINHASH_MASK for s in shingles]
        want = [min((a * h + b) % MINHASH_P for h in bases)
                for a, b in consts]
        assert list(got[i].sig) == want


@settings(max_examples=10, deadline=None)
@given(train=_corpus, bench=_corpus)
def test_decontaminate_matches_python(sp, train, bench):
    """The postings equi-join decontamination equals a set-algebra
    replay: hit shingles, distinct benchmark docs touched, and the
    contamination ratio per flagged training doc."""
    from python_vector_db___ai_spark.operators.dedup import decontaminate

    n = 2
    tr_df = _mk_docs(sp, train)
    bm_df = _mk_docs(sp, bench)
    got = {r.doc_id: r for r in decontaminate(tr_df, bm_df, n=n).collect()}

    def shingles(ws):
        return {" ".join(ws[p:p + n])
                for p in range(max(len(ws) - n + 1, 0))}

    bm_sh = {i: shingles(ws) for i, ws in enumerate(bench)}
    flagged = {}
    for i, ws in enumerate(train):
        sh = shingles(ws)
        hit = {s for s in sh if any(s in b for b in bm_sh.values())}
        if hit:
            nb = sum(1 for b in bm_sh.values() if b & sh)
            flagged[i] = (len(hit), nb,
                          round_half_up(len(hit) / max(len(sh), 1), 6))
    assert set(got) == set(flagged)
    for i, (nh, nb, cont) in flagged.items():
        r = got[i]
        assert (r.n_hit_shingles, r.n_benchmark_docs) == (nh, nb)
        assert r.contamination == pytest.approx(cont, abs=1e-12)
