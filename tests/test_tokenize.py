"""Unit tests for span-level exact-substring dedup and BPE training."""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.bpe import (
    bpe_train,
    word_frequencies,
)
from python_vector_db___ai_spark.operators.substring import span_dedup


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_span_dedup_keeps_global_first_occurrence(spark):
    # W=3 spans; doc 0 and doc 2 share span "a b c"; doc 1 repeats it
    # internally too.
    docs = spark.createDataFrame(
        [(0, "a b c x y z"),
         (1, "a b c a b c"),
         (2, "q r s a b c")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           span_dedup(docs, window=3).collect()}

    # doc 0 owns the first (doc_id, span_id) for "a b c": keeps all
    assert out[0]["n_spans"] == 2 and out[0]["n_dropped"] == 0
    assert out[0]["residual_hash"] == md5("a b c x y z")

    # doc 1: both spans are "a b c" — both lose to doc 0
    assert out[1]["n_spans"] == 2 and out[1]["n_dropped"] == 2
    assert out[1]["chars_dropped"] == 2 * len("a b c")
    assert out[1]["words_dropped"] == 6
    assert out[1]["residual_hash"] == md5("")

    # doc 2: second span dropped, first kept
    assert out[2]["n_dropped"] == 1
    assert out[2]["residual_hash"] == md5("q r s")


def test_span_dedup_ragged_tail_and_case_fold(spark):
    # 4 words at W=3 → spans "a b c" + ragged "d"; upper-case folds
    docs = spark.createDataFrame(
        [(0, "A b C d"), (1, "a B c")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           span_dedup(docs, window=3).collect()}
    assert out[0]["n_spans"] == 2 and out[0]["n_dropped"] == 0
    assert out[1]["n_spans"] == 1 and out[1]["n_dropped"] == 1
    assert out[1]["words_dropped"] == 3  # full 3-word span dropped
    assert out[1]["residual_hash"] == md5("")


def naive_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference: explicit leftmost-scan merge (not
    str.replace), explicit pair count."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rnd in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (a, b), w = min(counts.items(),
                        key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merges.append((rnd, f"{a} {b}", a + b, w))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_matches_naive_scan_merge(spark):
    docs = spark.createDataFrame(
        [(0, "low low low lower lowest"),
         (1, "new newer newest low"),
         (2, "wider wide new new")],
        ["doc_id", "text"])
    freq = word_frequencies(docs)
    got = [(r["round"], r["pair"], r["token"], r["weight"])
           for r in bpe_train(spark, freq, n_merges=8)
           .orderBy("round").collect()]
    wc = {r["word"]: r["c"] for r in freq.collect()}
    assert got == naive_bpe(wc, 8)
    # merges are learned most-frequent-first and are deterministic
    assert got[0][1] == "l o"  # 'lo' appears in 6 words, weight 6
    got2 = [(r["round"], r["pair"]) for r in
            bpe_train(spark, word_frequencies(docs), n_merges=8)
            .orderBy("round").collect()]
    assert [(g[0], g[1]) for g in got] == got2


def test_bpe_overlapping_pair_is_leftmost_greedy(spark):
    # 'aaaa' with pair (a,a): leftmost-greedy → (aa)(aa), weight 3
    docs = spark.createDataFrame([(0, "aaaa aaaa")], ["doc_id", "text"])
    freq = word_frequencies(docs)
    got = [(r["pair"], r["token"], r["weight"]) for r in
           bpe_train(spark, freq, n_merges=2).orderBy("round").collect()]
    wc = {r["word"]: r["c"] for r in freq.collect()}
    assert got == [(p, t, w) for _, p, t, w in naive_bpe(wc, 2)]
    assert got[0] == ("a a", "aa", 6)   # 3 adjacent positions × count 2
    assert got[1] == ("aa aa", "aaaa", 2)


def test_word_frequencies_vocab_cap(spark):
    docs = spark.createDataFrame(
        [(0, "z z z y y x w")], ["doc_id", "text"])
    top = word_frequencies(docs, max_vocab=2).collect()
    # count DESC, word ASC: z(3), y(2)
    assert [(r["word"], r["c"]) for r in top] == [("z", 3), ("y", 2)]


def test_span_dedup_plan_shape(spark):
    """Scale witnesses: the keeper choice partial-aggregates map-side
    (one shuffle on the span key) and the per-doc reduce is the only
    other shuffle.  The join back is a plain equi-join on the span
    key — at THIS scale AQE happens to broadcast the keepers frame,
    but that is size-dependent (one row per distinct corpus span), so
    the test asserts only the scale-invariant properties: no
    cartesian product, bounded exchanges, map-side combine."""
    from python_vector_db___ai_spark.plans.explain import (
        count_exchanges,
        formatted_plan,
    )
    from python_vector_db___ai_spark.session import load_table
    from tests.conftest import SF_DIR

    spark.catalog.clearCache()
    out = span_dedup(load_table(spark, SF_DIR, "documents"), window=10)
    plan = formatted_plan(out)
    assert "partial_min" in plan          # map-side combine before shuffle
    assert count_exchanges(out) <= 2, plan  # keeper agg + per-doc agg only
    assert "CartesianProduct" not in plan


def test_bpe_wordfreq_partial_aggregates(spark):
    from python_vector_db___ai_spark.plans.explain import formatted_plan
    from python_vector_db___ai_spark.session import load_table
    from tests.conftest import SF_DIR

    spark.catalog.clearCache()
    freq = word_frequencies(load_table(spark, SF_DIR, "documents"))
    plan = formatted_plan(freq)
    assert "partial_count" in plan        # combiner before the shuffle
    assert "TakeOrderedAndProject" in plan  # vocab cap is top-k, not sort-all


def test_bpe_token_count_expr_matches_python_scan(spark):
    """The pure-expression segmenter (chained double-spaced replace)
    must agree with an explicit greedy-scan segmentation."""
    from python_vector_db___ai_spark.operators.bpe import (
        bpe_merge_list,
        bpe_token_count_col,
    )

    docs = spark.createDataFrame(
        [(0, "low low low lower lowest aaaa"),
         (1, "new newer newest low aaaa aaaa")],
        ["doc_id", "text"])
    freq = word_frequencies(docs)
    merges = bpe_merge_list(freq, n_merges=6)

    def scan_segment(word):
        syms = list(word)
        for _, pair, token, _ in merges:
            a, b = pair.split(" ")
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(token)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    words = [r["word"] for r in freq.collect()]
    wdf = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {r["word"]: r["n"] for r in
           wdf.select("word", bpe_token_count_col(
               F.col("word"), merges).alias("n")).collect()}
    for w in words:
        assert got[w] == scan_segment(w), (w, got[w], scan_segment(w))


def test_span_dedup_hot_span_skew(spark):
    """A span duplicated across 20k docs must reduce through the
    map-side partial min, not sort 20k rows on one key — and the
    keeper must still be the global first occurrence."""
    hot = "x " * 9 + "x"  # one 10-word span, identical in every doc
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(hot + " uniq"),
                 F.col("id").cast("string")).alias("text"))
    out = span_dedup(docs, window=10)
    agg = out.agg(
        F.sum("n_dropped").alias("d"),
        F.sum(F.when(F.col("doc_id") == 0, F.col("n_dropped"))
              .otherwise(0)).alias("d0")).collect()[0]
    # doc 0 keeps the hot span; 19,999 copies drop; ragged tails unique
    assert agg["d"] == 19_999
    assert agg["d0"] == 0


def test_pipeline_plan_has_no_cartesian(spark):
    from python_vector_db___ai_spark.plans.explain import formatted_plan
    from python_vector_db___ai_spark.plans.q_tokenize import (
        pipeline_corpus_to_tokens,
    )
    from tests.conftest import SF_DIR

    spark.catalog.clearCache()
    plan = formatted_plan(pipeline_corpus_to_tokens(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan     # keeper aggregations combine map-side


def test_span_dedup_empty_and_single_word_docs(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "solo"), (2, "solo")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(docs, window=3).collect()}
    assert out[0]["n_spans"] == 0 and out[0]["n_dropped"] == 0
    assert out[0]["residual_hash"] == md5("")
    assert out[1]["n_spans"] == 1 and out[1]["n_dropped"] == 0
    # doc 2's single ragged span duplicates doc 1's
    assert out[2]["n_dropped"] == 1 and out[2]["words_dropped"] == 1


def test_bpe_empty_corpus_yields_no_merges(spark):
    docs = spark.createDataFrame([(0, "   ")], ["doc_id", "text"])
    freq = word_frequencies(docs)
    assert freq.count() == 0
    assert bpe_train(spark, freq, n_merges=5).count() == 0


def test_bpe_stops_when_no_pairs_remain(spark):
    # single-char words never produce adjacent pairs
    docs = spark.createDataFrame([(0, "a b c a")], ["doc_id", "text"])
    merges = bpe_train(spark, word_frequencies(docs), n_merges=5)
    assert merges.count() == 0


def test_bpe_tie_break_matches_sql_string_order(spark):
    """Round-6 ADVICE regression: when tied pairs involve a symbol
    that extends another with a sub-0x20 char (control chars survive
    the \\s+ tokenizer), the Python tuple order (a, b) and the SQL
    ``ORDER BY pair ASC`` string order diverge.  The engine must sort
    by the exact space-joined string the oracle sorts — verified here
    differentially against the real unrolled-CTE DuckDB oracle."""
    import duckdb
    import pandas as pd

    from python_vector_db___ai_spark.plans.q_tokenize import (
        _bpe_oracle,
    )

    # Round 1 merges (x, \x01) -> 'x\x01' (weight 3).  Round 2 ties
    # ('x\x01', 'z') and ('x', 'y') at weight 2: tuple order picks
    # ('x', 'y') ('x' < 'x\x01'), string order picks 'x\x01 z'
    # ('\x01' < ' ' < 'y').  The oracle's answer is 'x\x01 z'.
    text = "x\x01z x\x01z wx\x01 xy xy"
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    got = [(r["round"], r["pair"], r["token"], r["weight"]) for r in
           bpe_train(spark, word_frequencies(docs), n_merges=2)
           .orderBy("round").collect()]

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [0],
                                            "text": [text]}))
    want = [tuple(r) for r in
            con.execute(_bpe_oracle(2, 50000)
                        + " ORDER BY round").fetchall()]
    assert got == want
    assert got[1][1] == "x\x01 z"  # the string-order winner
