"""Tokenizer, substring-dedup, sketch, and pipeline-composition queries.

Training-data-pipeline operators with no reference analog (the
reference consumes pre-trained tokenizers and dedups whole documents;
see the ``operators/bpe.py`` / ``substring.py`` / ``cms.py``
docstrings): BPE training (`bpe_train_merges`) and application
(`bpe_encode_stats`), span-level exact-substring dedup
(`corpus_span_dedup`), the end-to-end corpus→token-yield pipeline
(`pipeline_corpus_to_tokens`), the HLL approximate-distinct invariant
check (`events_approx_distinct`), and count-min heavy hitters
(`words_heavy_hitters_cms`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.bpe import (
    bpe_train,
    word_frequencies,
)
from python_vector_db___ai_spark.operators.dedup import words_col
from python_vector_db___ai_spark.operators.substring import span_dedup
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table

_SPAN_W = 10

_WORDS_D = ("list_filter(regexp_split_to_array(lower(text), '\\s+'), "
            "w -> w <> '')")


@register(
    "corpus_span_dedup",
    oracle=f"""
WITH arr AS (
  SELECT doc_id, {_WORDS_D} AS ws FROM documents
), spans AS (
  SELECT arr.doc_id, i.i AS span_id,
         array_to_string(arr.ws[i.i * {_SPAN_W} + 1 : (i.i + 1) * {_SPAN_W}],
                         ' ') AS span
  FROM arr, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(arr.ws) / {_SPAN_W}.0) AS BIGINT)))
           AS i) i
), tagged AS (
  SELECT doc_id, span_id, span,
         row_number() OVER (PARTITION BY span
                            ORDER BY doc_id, span_id) AS rn
  FROM spans
)
SELECT d.doc_id,
       count(t.span)::BIGINT AS n_spans,
       coalesce(sum(CASE WHEN t.rn > 1 THEN 1 END), 0)::BIGINT
         AS n_dropped,
       coalesce(sum(CASE WHEN t.rn > 1
                         THEN len(string_split(t.span, ' ')) END),
                0)::BIGINT AS words_dropped,
       coalesce(sum(CASE WHEN t.rn > 1 THEN len(t.span) END), 0)::BIGINT
         AS chars_dropped,
       md5(coalesce(string_agg(CASE WHEN t.rn = 1 THEN t.span END,
                               ' ' ORDER BY t.span_id), ''))
         AS residual_hash
FROM documents d LEFT JOIN tagged t ON d.doc_id = t.doc_id
GROUP BY d.doc_id
""",
    doc="exact-substring (span) dedup, Lee-et-al-2021 style: "
        "non-overlapping word windows, one hash-agg keeper choice on "
        "the span key (min struct — no window over the skewed key), "
        "residual doc reassembled + hash-compared",
)
def corpus_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return span_dedup(docs, window=_SPAN_W)


_BPE_MERGES = 10
_BPE_MAX_VOCAB = 50_000


def _bpe_merge_ctes(n_merges: int, max_vocab: int) -> str:
    """Unrolled-CTE replay of the deterministic BPE loop.

    Recursive CTEs cannot re-aggregate the working set per round, so
    each round r is three explicit CTEs: p{{r}} (weighted adjacent
    pair counts), b{{r}} (argmax pair, ties lexicographic), v{{r}}
    (greedy merge via ``replace`` over the double-spaced symbol
    string — see ``operators/bpe.py`` for why double spacing makes
    ``replace`` ≡ the greedy scan).  The round CTEs are MATERIALIZED:
    DuckDB inlines CTEs by default, and each round references the
    previous one twice, so the inlined plan re-scans the base table
    2^rounds times (observed as an fd-exhaustion failure at 10
    rounds).
    """
    sql = f"""
WITH w AS (
  SELECT word, count(*)::BIGINT AS c
  FROM (SELECT unnest({_WORDS_D}) AS word FROM documents)
  GROUP BY word ORDER BY c DESC, word ASC LIMIT {max_vocab}
), v0 AS MATERIALIZED (
  SELECT array_to_string(string_split(word, ''), ' ') AS sym, c FROM w
)"""
    for r in range(1, n_merges + 1):
        p = r - 1
        sql += f""",
p{r} AS MATERIALIZED (
  SELECT s.arr[i.i] || ' ' || s.arr[i.i + 1] AS pair,
         sum(s.c)::BIGINT AS weight
  FROM (SELECT string_split(trim(sym), ' ') AS arr, c FROM v{p}) s,
       LATERAL (SELECT unnest(range(1, len(s.arr))) AS i) i
  GROUP BY pair
), b{r} AS MATERIALIZED (
  SELECT {r}::BIGINT AS round, pair, replace(pair, ' ', '') AS token,
         weight
  FROM p{r} ORDER BY weight DESC, pair ASC LIMIT 1
), v{r} AS MATERIALIZED (
  SELECT replace(trim(replace(
           ' ' || replace(sym, ' ', '  ') || ' ',
           coalesce(' ' || replace((SELECT pair FROM b{r}), ' ', '  ')
                    || ' ', chr(1)),
           coalesce(' ' || (SELECT token FROM b{r}) || ' ', chr(1)))),
         '  ', ' ') AS sym,
         c
  FROM v{p}
)"""
    return sql


def _bpe_oracle(n_merges: int, max_vocab: int) -> str:
    union = " UNION ALL ".join(
        f"SELECT * FROM b{r}" for r in range(1, n_merges + 1))
    return (_bpe_merge_ctes(n_merges, max_vocab)
            + f"\nSELECT round, pair, token, weight FROM ({union}) u")


@register(
    "bpe_train_merges",
    oracle=_bpe_oracle(_BPE_MERGES, _BPE_MAX_VOCAB),
    doc="BPE tokenizer training: one distributed word-frequency pass, "
        "deterministic merge loop on the bounded vocabulary "
        "(HuggingFace/SentencePiece split); oracle unrolls the loop "
        "as CTE rounds",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = word_frequencies(docs, max_vocab=_BPE_MAX_VOCAB)
    return bpe_train(spark, freq, n_merges=_BPE_MERGES)


def _bpe_apply_sql(expr: str, n_merges: int) -> str:
    """Chained-``replace`` application of the learned merges to a
    char-spaced symbol expression — the same double-spaced greedy
    form as v{r}, with each round's pair/token read from b{r}."""
    for r in range(1, n_merges + 1):
        expr = (
            f"replace(trim(replace(' ' || replace({expr}, ' ', '  ') "
            f"|| ' ', coalesce(' ' || replace((SELECT pair FROM b{r}), "
            f"' ', '  ') || ' ', chr(1)), coalesce(' ' || "
            f"(SELECT token FROM b{r}) || ' ', chr(1)))), '  ', ' ')")
    return expr


@register(
    "bpe_encode_stats",
    oracle=_bpe_merge_ctes(_BPE_MERGES, _BPE_MAX_VOCAB) + f""",
dw AS MATERIALIZED (
  SELECT DISTINCT word
  FROM (SELECT unnest({_WORDS_D}) AS word FROM documents)
), seg AS MATERIALIZED (
  SELECT word,
         len(string_split(
           {_bpe_apply_sql("array_to_string(string_split(word, ''), ' ')",
                           _BPE_MERGES)}, ' '))::BIGINT AS n_tokens
  FROM dw
), wrds AS (
  SELECT doc_id, unnest({_WORDS_D}) AS word FROM documents
)
SELECT w.doc_id,
       count(*)::BIGINT AS n_words,
       sum(s.n_tokens)::BIGINT AS n_bpe_tokens,
       round(sum(s.n_tokens)::DOUBLE / count(*), 6) AS tokens_per_word
FROM wrds w JOIN seg s USING (word)
GROUP BY w.doc_id
""",
    doc="apply the learned BPE merges to the corpus: the distinct "
        "word set is segmented ONCE by a pure-expression replace "
        "chain (tokenize the vocabulary, not the corpus — the "
        "standard trainer trick) and joined back to the postings; "
        "per-doc whitespace-vs-BPE token accounting",
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.operators.bpe import (
        bpe_merge_list,
        bpe_token_count_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_merge_list(
        word_frequencies(docs, max_vocab=_BPE_MAX_VOCAB),
        n_merges=_BPE_MERGES)
    words = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("word"))
    seg = (words.select("word").distinct()
           .withColumn("n_tokens",
                       bpe_token_count_col(F.col("word"), merges)
                       .cast("long")))
    return (words.join(seg, "word")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum("n_tokens").cast("long").alias("n_bpe_tokens"))
            .withColumn("tokens_per_word",
                        F.round(F.col("n_bpe_tokens").cast("double")
                                / F.col("n_words"), 6)))


_P_MIN_WORDS = 25


@register(
    "pipeline_corpus_to_tokens",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source, md5(text) AS ch, len({_WORDS_D}) AS nw
  FROM documents
), k AS (
  SELECT ch, min(doc_id) AS kid FROM h GROUP BY ch
), f AS (
  SELECT h.doc_id, h.source, h.nw,
         (h.doc_id = k.kid) AS canon,
         (h.nw >= {_P_MIN_WORDS}) AS gate
  FROM h JOIN k USING (ch)
), arr AS (
  SELECT d.doc_id, {_WORDS_D} AS ws
  FROM documents d JOIN f ON d.doc_id = f.doc_id
  WHERE f.canon AND f.gate
), spans AS (
  SELECT arr.doc_id, i.i AS span_id,
         array_to_string(arr.ws[i.i * {_SPAN_W} + 1 : (i.i + 1) * {_SPAN_W}],
                         ' ') AS span
  FROM arr, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(arr.ws) / {_SPAN_W}.0) AS BIGINT)))
           AS i) i
), tagged AS (
  SELECT doc_id, span,
         row_number() OVER (PARTITION BY span
                            ORDER BY doc_id, span_id) AS rn
  FROM spans
), wd AS (
  SELECT doc_id,
         coalesce(sum(CASE WHEN rn > 1
                           THEN len(string_split(span, ' ')) END),
                  0)::BIGINT AS w
  FROM tagged GROUP BY doc_id
)
SELECT f.source,
       count(*)::BIGINT AS docs_in,
       sum(CASE WHEN f.canon THEN 1 ELSE 0 END)::BIGINT AS docs_canonical,
       sum(CASE WHEN f.canon AND f.gate THEN 1 ELSE 0 END)::BIGINT
         AS docs_kept,
       sum(f.nw)::BIGINT AS words_in,
       sum(CASE WHEN f.canon AND f.gate
                THEN f.nw - coalesce(wd.w, 0) ELSE 0 END)::BIGINT
         AS words_kept,
       sum(coalesce(wd.w, 0))::BIGINT AS span_words_dropped,
       CASE WHEN sum(f.nw) > 0
            THEN round(sum(CASE WHEN f.canon AND f.gate
                           THEN f.nw - coalesce(wd.w, 0)
                           ELSE 0 END)::DOUBLE / sum(f.nw), 6)
            END AS yield_frac
FROM f LEFT JOIN wd ON f.doc_id = wd.doc_id
GROUP BY f.source
""",
    doc="the whole pretraining-data pipeline as ONE declarative plan: "
        "exact dedup (content-hash keeper) -> min-words gate -> "
        "span-level exact-substring dedup over the survivors -> "
        "per-source token-yield report.  Composition of three "
        "individually-checked stages, checked end to end",
)
def pipeline_corpus_to_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus -> training-ready-token accounting, one plan.

    Scale shape: two pruned scans of the corpus (one for hash+count,
    one feeding span dedup on the survivors), one groupBy on the
    content hash, one on the span key, one equi-join back, one final
    per-source hash aggregate.  Nothing quadratic, no windows over
    skewed keys, no driver collects.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", F.md5(F.col("text")).alias("_ch"),
        F.size(words_col(F.col("text"))).alias("n_words"))
    keep = base.groupBy("_ch").agg(F.min("doc_id").alias("_k"))
    flags = (base.join(keep, "_ch")
             .select("doc_id", "source", "n_words",
                     (F.col("doc_id") == F.col("_k")).alias("canon"),
                     (F.col("n_words") >= _P_MIN_WORDS).alias("gate")))
    kept_ids = flags.filter(F.col("canon") & F.col("gate")) \
        .select("doc_id")
    sd = span_dedup(docs.join(kept_ids, "doc_id"), window=_SPAN_W) \
        .select("doc_id", "words_dropped")
    per = flags.join(sd, "doc_id", "left")
    kept = F.col("canon") & F.col("gate")
    wd = F.coalesce("words_dropped", F.lit(0))
    return (per.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_in"),
        F.sum(F.col("canon").cast("long")).cast("long")
        .alias("docs_canonical"),
        F.sum(kept.cast("long")).cast("long").alias("docs_kept"),
        F.sum("n_words").cast("long").alias("words_in"),
        F.sum(F.when(kept, F.col("n_words") - wd).otherwise(0))
        .cast("long").alias("words_kept"),
        F.sum(wd).cast("long").alias("span_words_dropped"))
        .withColumn(
            "yield_frac",
            # Guard x/0: Spark non-ANSI double/0 -> NULL but DuckDB IEEE
            # -> inf, so an all-empty source would diverge cross-engine
            # without the explicit CASE in BOTH engines (round-6 ADVICE).
            F.when(F.col("words_in") > 0,
                   F.round(F.col("words_kept").cast("double")
                           / F.col("words_in"), 6))))


@register(
    "events_approx_distinct",
    oracle="""
SELECT event_type,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
""",
    doc="HLL sketch invariant: approx_count_distinct (rsd=0.01) must "
        "land within 5% of the exact distinct count — the sketch is "
        "the 100-TB path (mergeable, fixed memory); exact columns "
        "hash-checked, the sketch via the always-true bound column",
)
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.countDistinct("user_id").cast("long").alias("n_users"),
                 F.approx_count_distinct("user_id", rsd=0.01)
                 .alias("_approx"))
            .select("event_type", "n_events", "n_users",
                    (F.abs(F.col("_approx") - F.col("n_users"))
                     <= 0.05 * F.col("n_users"))
                    .alias("approx_within_5pct")))


_HH_TOPK = 20


@register(
    "words_heavy_hitters_cms",
    oracle=f"""
WITH w AS (
  SELECT unnest({_WORDS_D}) AS word FROM documents
), c AS (
  SELECT word, count(*)::BIGINT AS exact_count FROM w GROUP BY word
)
SELECT word, exact_count,
       TRUE AS cms_ge_exact
FROM c ORDER BY exact_count DESC, word ASC LIMIT {_HH_TOPK}
""",
    doc="count-min sketch heavy hitters: per-partition depth x width "
        "counter tables merged element-wise (mergeable fixed-memory "
        "sketch, the 100-TB path for unbounded key spaces); the exact "
        "top-k is hash-checked; only the DETERMINISTIC one-sided "
        "guarantee (estimate >= exact) is an oracle column — the "
        "probabilistic eps-N upper bound is a tests/test_cms.py "
        "advisory invariant instead (round-6 ADVICE)",
)
def words_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from python_vector_db___ai_spark.operators.cms import (
        cms_build,
        cms_estimate,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(words_col(F.col("text"))).alias("word"))
    table, _n_tokens = cms_build(words, token_col="word")

    top = (words.groupBy("word")
           .agg(F.count("*").cast("long").alias("exact_count"))
           .orderBy(F.col("exact_count").desc(), F.col("word").asc())
           .limit(_HH_TOPK))
    # Only the deterministic one-sided guarantee is emitted (the eps-N
    # upper bound is probabilistic over hash draws — see operators/cms.py
    # docstring and tests/test_cms.py).
    rows = [(r["word"], r["exact_count"],
             bool(cms_estimate(table, r["word"]) >= r["exact_count"]))
            for r in top.collect()]
    return spark.createDataFrame(rows, T.StructType([
        T.StructField("word", T.StringType(), False),
        T.StructField("exact_count", T.LongType(), False),
        T.StructField("cms_ge_exact", T.BooleanType(), False),
    ]))
