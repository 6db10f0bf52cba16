"""Text-analysis queries over the ``documents`` table: language ID,
quality scoring, token counting, winnowing fingerprints."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.hashing import stable_hash_sql, stable_hash64
from python_vector_db___ai_spark.functions.text import (
    MIN_STOPWORD_HITS,
    STOPWORDS,
    _PII_PATTERNS,
    detect_language,
    lang_scores,
    pii_counts,
    quality_metrics,
    quality_score,
    redact_pii,
    token_counts,
)
from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table

_WORDS_D = ("list_distinct(list_filter(regexp_split_to_array(lower(text), "
            "'\\s+'), w -> w <> ''))")
_WORDS_ALL = ("list_filter(regexp_split_to_array(lower(text), '\\s+'), "
              "w -> w <> '')")

# Deterministic PII injection so the audit columns are non-trivial on a
# clean synthetic corpus: every doc gets one email/phone/IPv4/SSN derived
# from doc_id, identically in Spark and in the DuckDB oracle.
_PII_AUG_SQL = (
    "text || ' contact: user' || doc_id::VARCHAR || '@example.com ph 555-'"
    " || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'"
    " || lpad(((doc_id * 3) % 10000)::VARCHAR, 4, '0')"
    " || ' ip ' || (doc_id % 256)::VARCHAR || '.'"
    " || ((doc_id * 7) % 256)::VARCHAR || '.0.1 ssn '"
    " || lpad(((doc_id % 900) + 100)::VARCHAR, 3, '0') || '-'"
    " || lpad((doc_id % 100)::VARCHAR, 2, '0') || '-'"
    " || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
)


def _pii_sql_cols() -> str:
    counts = ",\n         ".join(
        f"len(regexp_extract_all(aug, '{pat}'))::BIGINT AS pii_{kind}"
        for kind, pat in _PII_PATTERNS.items())
    redacted = "aug"
    for kind, pat in _PII_PATTERNS.items():
        redacted = f"regexp_replace({redacted}, '{pat}', '[{kind}]', 'g')"
    return f"{counts},\n         md5({redacted}) AS pii_redacted_md5"


def _pii_aug_col() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"), F.lit(" contact: user"),
        d.cast("string"), F.lit("@example.com ph 555-"),
        F.lpad((d % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad(((d * 3) % 10000).cast("string"), 4, "0"),
        F.lit(" ip "), (d % 256).cast("string"), F.lit("."),
        ((d * 7) % 256).cast("string"), F.lit(".0.1 ssn "),
        F.lpad(((d % 900) + 100).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((d % 100).cast("string"), 2, "0"), F.lit("-"),
        F.lpad((d % 10000).cast("string"), 4, "0"))


def _text_profile_oracle() -> str:
    score_cols = ", ".join(
        "len(list_intersect(words, ["
        + ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        + f"]))::BIGINT AS c_{lang}"
        for lang in sorted(STOPWORDS))
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in sorted(STOPWORDS)) + ")"
    cascade = "CASE " + " ".join(
        f"WHEN c_{lang} = best THEN '{lang}'" for lang in sorted(STOPWORDS)
    ) + " END"
    en_stop = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH w AS (
  SELECT doc_id, lang, {_WORDS_D} AS words FROM documents
), s AS (
  SELECT doc_id, lang, {score_cols} FROM w
), b AS (
  SELECT *, {best} AS best FROM s
), lid AS (
  SELECT doc_id, lang,
         CASE WHEN best >= {MIN_STOPWORD_HITS} THEN {cascade}
              ELSE 'unknown' END AS pred_lang,
         best AS stopword_hits,
         (CASE WHEN best >= {MIN_STOPWORD_HITS} THEN {cascade}
               ELSE 'unknown' END) = lang AS is_match
  FROM b
), m AS (
  SELECT doc_id,
         length(text)::DOUBLE AS n_chars,
         len({_WORDS_ALL})::DOUBLE AS n_words,
         list_sum(list_transform({_WORDS_ALL}, w -> len(w)))::DOUBLE AS word_chars,
         (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\-]', '', 'g')))::DOUBLE AS punct,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE AS digits,
         len(list_filter({_WORDS_ALL},
             w -> list_contains([{en_stop}], w)))::DOUBLE AS n_stop,
         len(list_distinct({_WORDS_ALL}))::DOUBLE AS n_uniq,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT AS regex_tokens,
         CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
  FROM documents
), r AS (
  SELECT doc_id,
         n_chars::BIGINT AS n_chars, n_words::BIGINT AS n_words,
         CASE WHEN n_words > 0 THEN word_chars / n_words ELSE 0.0 END AS avg_word_len,
         CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_chars > 0 THEN digits / n_chars ELSE 0.0 END AS digit_ratio,
         CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END AS stopword_ratio,
         CASE WHEN n_words > 0 THEN n_uniq / n_words ELSE 0.0 END AS unique_word_ratio,
         regex_tokens, approx_bpe_tokens
  FROM m
), q AS (
  SELECT doc_id, n_chars, n_words,
         round(avg_word_len, 6) AS avg_word_len,
         round(punct_ratio, 6) AS punct_ratio,
         round(digit_ratio, 6) AS digit_ratio,
         round(stopword_ratio, 6) AS stopword_ratio,
         round(unique_word_ratio, 6) AS unique_word_ratio,
         round(least(n_words / 100.0, 1.0) * 0.25
               + unique_word_ratio * 0.25
               + least(stopword_ratio * 4, 1.0) * 0.25
               + greatest(0.0, 1.0 - punct_ratio * 5 - digit_ratio * 5) * 0.25,
               6) AS quality,
         n_words AS ws_tokens, regex_tokens, approx_bpe_tokens
  FROM r
)
SELECT lid.doc_id, lid.lang, lid.pred_lang, lid.stopword_hits, lid.is_match,
       q.n_chars, q.n_words, q.avg_word_len, q.punct_ratio, q.digit_ratio,
       q.stopword_ratio, q.unique_word_ratio, q.quality,
       q.ws_tokens, q.regex_tokens, q.approx_bpe_tokens,
       coalesce(ls.lang_n_docs, 0) AS lang_n_docs,
       coalesce(ls.lang_n_sources, 0) AS lang_n_sources,
       coalesce(ls.lang_n_unique_contents, 0) AS lang_n_unique_contents,
       pc.pii_email, pc.pii_phone, pc.pii_ipv4, pc.pii_ssn,
       pc.pii_redacted_md5
FROM lid
JOIN q ON q.doc_id = lid.doc_id
JOIN (
  SELECT doc_id, {_pii_sql_cols()}
  FROM (SELECT doc_id, {_PII_AUG_SQL} AS aug FROM documents)
) pc ON pc.doc_id = lid.doc_id
LEFT JOIN (
  SELECT lang, count(*)::BIGINT AS lang_n_docs,
         count(DISTINCT source)::BIGINT AS lang_n_sources,
         count(DISTINCT md5(text))::BIGINT AS lang_n_unique_contents
  FROM documents GROUP BY lang
) ls ON ls.lang IS NOT DISTINCT FROM lid.lang
"""


@register(
    "text_profile",
    oracle=_text_profile_oracle(),
    doc="per-doc text-analysis profile, one pass: F7 stopword-heuristic "
        "language ID vs the labeled lang column, per-doc quality metrics "
        "+ composite [0,1] score (training-data gate), token counts "
        "(whitespace + BPE-ish regex + chars/4), A3 per-lang "
        "distinct-count stats (one hash agg, broadcast back), and a PII audit "
        "(per-kind match counts + typed-redaction checksum) with one "
        "deterministic doc_id-derived email/phone/IP/SSN injected per doc",
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.functions.hashing import md5_hex

    # ONE narrow pruned scan feeds both the per-doc profile projection
    # and the per-lang stats aggregation (cached so the agg branch does
    # not re-read the table; at cluster scale this projection is small
    # enough to recompute or checkpoint instead).
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "lang", "source", "text").cache())
    scores = lang_scores(F.col("text"))
    pred = detect_language(F.col("text"), scores=scores)
    m = quality_metrics(F.col("text"))
    tc = token_counts(F.col("text"))
    aug = _pii_aug_col()
    pii = pii_counts(aug)
    # Per-lang distinct stats as ONE hash aggregation broadcast back
    # onto the rows.  (An unbounded window collect_set per row keyed on
    # a low-cardinality skewed column puts most of the corpus in one
    # task at 100x — the agg+broadcast form is the scale-safe plan.)
    lang_stats = (docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("lang_n_docs"),
        F.countDistinct("source").cast("long").alias("lang_n_sources"),
        F.countDistinct(md5_hex(F.col("text"))).cast("long")
        .alias("lang_n_unique_contents")))
    profile = docs.select(
        "doc_id", "lang",
        pred.alias("pred_lang"),
        F.greatest(*scores.values()).alias("stopword_hits"),
        (pred == F.col("lang")).alias("is_match"),
        m["n_chars"].alias("n_chars"), m["n_words"].alias("n_words"),
        F.round(m["avg_word_len"], 6).alias("avg_word_len"),
        F.round(m["punct_ratio"], 6).alias("punct_ratio"),
        F.round(m["digit_ratio"], 6).alias("digit_ratio"),
        F.round(m["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(m["unique_word_ratio"], 6).alias("unique_word_ratio"),
        F.round(quality_score(F.col("text"), metrics=m), 6).alias("quality"),
        tc["ws_tokens"].alias("ws_tokens"),
        tc["regex_tokens"].alias("regex_tokens"),
        tc["approx_bpe_tokens"].alias("approx_bpe_tokens"),
        pii["email"].alias("pii_email"),
        pii["phone"].alias("pii_phone"),
        pii["ipv4"].alias("pii_ipv4"),
        pii["ssn"].alias("pii_ssn"),
        F.md5(redact_pii(aug)).alias("pii_redacted_md5"))
    # Null-safe LEFT join so a NULL-lang doc keeps its profile row AND
    # picks up the real NULL-lang group stats (a plain equi-join would
    # null-reject and report 0 for unlabeled docs).
    ls = lang_stats.withColumnRenamed("lang", "_ls_lang")
    return (profile.join(F.broadcast(ls),
                         profile["lang"].eqNullSafe(ls["_ls_lang"]), "left")
            .select("doc_id", "lang", "pred_lang", "stopword_hits",
                    "is_match", "n_chars", "n_words", "avg_word_len",
                    "punct_ratio", "digit_ratio", "stopword_ratio",
                    "unique_word_ratio", "quality", "ws_tokens",
                    "regex_tokens", "approx_bpe_tokens",
                    F.coalesce("lang_n_docs", F.lit(0)).alias("lang_n_docs"),
                    F.coalesce("lang_n_sources", F.lit(0))
                    .alias("lang_n_sources"),
                    F.coalesce("lang_n_unique_contents", F.lit(0))
                    .alias("lang_n_unique_contents"),
                    "pii_email", "pii_phone", "pii_ipv4", "pii_ssn",
                    "pii_redacted_md5"))


def _rep_grams_sql(n: int) -> str:
    """Non-distinct word n-grams over the w column (multiplicity kept —
    repetition metrics count occurrences, unlike dedup's shingles)."""
    return (f"CASE WHEN len(w) >= {n} THEN "
            f"list_transform(range(1, len(w) - {n - 1} + 1), "
            f"i -> array_to_string(w[i:i+{n - 1}], ' ')) "
            f"ELSE [] END")


_REPETITION_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {_WORDS_ALL} AS w FROM documents
), lines AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\n'),
                            l -> trim(l) <> '')) AS ln
  FROM documents
), per_line AS (
  SELECT doc_id, ln, count(*)::BIGINT AS c, length(ln)::BIGINT AS chars
  FROM lines GROUP BY doc_id, ln
), line_stats AS (
  SELECT doc_id, sum(c)::BIGINT AS n_lines,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_lines,
         sum(c * chars) AS line_chars,
         sum(CASE WHEN c > 1 THEN c * chars ELSE 0 END) AS dup_line_chars
  FROM per_line GROUP BY doc_id
), uni AS (
  SELECT doc_id, unnest(w) AS word FROM base
), per_word AS (
  SELECT doc_id, word, count(*)::DOUBLE AS c FROM uni GROUP BY doc_id, word
), tot AS (
  SELECT doc_id, sum(c) AS n_words FROM per_word GROUP BY doc_id
), entropy AS (
  SELECT p.doc_id,
         -sum((c / n_words) * ln(c / n_words)) AS unigram_entropy
  FROM per_word p JOIN tot t ON t.doc_id = p.doc_id GROUP BY p.doc_id
), bi AS (
  SELECT doc_id, unnest({_rep_grams_sql(2)}) AS g FROM base
), per_bi AS (
  SELECT doc_id, g, count(*)::BIGINT AS c FROM bi GROUP BY doc_id, g
), bi_stats AS (
  SELECT doc_id, max(c) AS top_2gram, sum(c) AS n_2grams
  FROM per_bi GROUP BY doc_id
), five AS (
  SELECT doc_id, unnest({_rep_grams_sql(5)}) AS g FROM base
), per_five AS (
  SELECT doc_id, g, count(*)::BIGINT AS c FROM five GROUP BY doc_id, g
), five_stats AS (
  SELECT doc_id,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_5grams,
         sum(c) AS n_5grams
  FROM per_five GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(l.n_lines, 0)::BIGINT AS n_lines,
       round(CASE WHEN coalesce(l.n_lines, 0) > 0
                  THEN l.dup_lines * 1.0 / l.n_lines ELSE 0.0 END, 6)
         AS dup_line_frac,
       round(CASE WHEN coalesce(l.line_chars, 0) > 0
                  THEN l.dup_line_chars * 1.0 / l.line_chars
                  ELSE 0.0 END, 6) AS dup_line_char_frac,
       round(CASE WHEN coalesce(b.n_2grams, 0) > 0
                  THEN b.top_2gram * 1.0 / b.n_2grams ELSE 0.0 END, 6)
         AS top_2gram_frac,
       round(CASE WHEN coalesce(f.n_5grams, 0) > 0
                  THEN f.dup_5grams * 1.0 / f.n_5grams ELSE 0.0 END, 6)
         AS dup_5gram_frac,
       round(coalesce(e.unigram_entropy, 0.0), 6) AS unigram_entropy
FROM documents d
LEFT JOIN line_stats l ON l.doc_id = d.doc_id
LEFT JOIN entropy e ON e.doc_id = d.doc_id
LEFT JOIN bi_stats b ON b.doc_id = d.doc_id
LEFT JOIN five_stats f ON f.doc_id = d.doc_id
"""


@register(
    "text_repetition",
    oracle=_REPETITION_ORACLE,
    doc="Gopher-style repetition quality filters (Rae et al. 2021 "
        "A1.1, the MassiveText/RefinedWeb/Dolma rules): per-doc "
        "duplicated-line row/char fractions, top word-bigram mass, "
        "duplicated 5-gram mass, and unigram entropy — each an explode "
        "+ hash-agg on the (doc, unit) key (postings shape, partial "
        "aggregation, no windows), the pre-training corpus gate the "
        "reference lacks",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.operators.quality import (
        repetition_metrics,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repetition_metrics(docs)


@register(
    "corpus_source_report",
    oracle=f"""
WITH m AS (
  SELECT doc_id, source, lang, md5(text) AS ch,
         len({_WORDS_ALL})::DOUBLE AS n_words,
         length(text)::DOUBLE AS n_chars,
         (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\-]', '', 'g')))::DOUBLE AS punct,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE AS digits,
         len(list_filter({_WORDS_ALL},
             w -> list_contains([{", ".join(f"'{w}'" for w in STOPWORDS['en'])}], w)))::DOUBLE AS n_stop,
         len(list_distinct({_WORDS_ALL}))::DOUBLE AS n_uniq
  FROM documents
), q AS (
  SELECT source, lang, ch, n_words,
         round(least(n_words / 100.0, 1.0) * 0.25
               + (CASE WHEN n_words > 0 THEN n_uniq / n_words ELSE 0.0 END) * 0.25
               + least((CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END) * 4, 1.0) * 0.25
               + greatest(0.0, 1.0
                          - (CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END) * 5
                          - (CASE WHEN n_chars > 0 THEN digits / n_chars ELSE 0.0 END) * 5) * 0.25,
               6) AS quality
  FROM m
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(n_words)::BIGINT AS total_words,
       round(avg(quality), 6) AS mean_quality,
       count(DISTINCT ch)::BIGINT AS n_unique_contents,
       round(1.0 - count(DISTINCT ch) * 1.0 / count(*), 6) AS dup_rate,
       count(DISTINCT lang)::BIGINT AS n_langs
FROM q GROUP BY source
""",
    doc="the per-source corpus card a mixture designer reads before "
        "setting sampling weights: docs, total whitespace tokens, mean "
        "composite quality, distinct-content count, exact-dup rate, "
        "and language spread per source — one projection + one hash "
        "aggregation on the source key",
)
def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.functions.hashing import md5_hex

    docs = load_table(spark, sf_dir, "documents")
    m = quality_metrics(F.col("text"))
    per_doc = docs.select(
        "source", "lang", md5_hex(F.col("text")).alias("ch"),
        m["n_words"].alias("n_words"),
        F.round(quality_score(F.col("text"), metrics=m), 6).alias("quality"))
    return (per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.countDistinct("ch").cast("long").alias("n_unique_contents"),
        F.round(F.lit(1.0) - F.countDistinct("ch") / F.count("*"), 6)
        .alias("dup_rate"),
        F.countDistinct("lang").cast("long").alias("n_langs")))


_XDOC_N = 8


@register(
    "crossdoc_dup_ngrams",
    oracle=f"""
WITH base AS (
  SELECT doc_id, {_WORDS_ALL} AS w FROM documents
), g AS (
  SELECT doc_id, unnest({{grams}}) AS gram FROM base
), pg AS (
  SELECT doc_id, gram, count(*)::BIGINT AS c FROM g GROUP BY doc_id, gram
), dfreq AS (
  SELECT gram, count(DISTINCT doc_id)::BIGINT AS df FROM pg GROUP BY gram
), stats AS (
  SELECT doc_id, sum(c) AS n_grams,
         sum(CASE WHEN df >= 2 THEN c ELSE 0 END) AS dup_grams
  FROM pg JOIN dfreq USING (gram) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(s.n_grams, 0)::BIGINT AS n_grams,
       coalesce(s.dup_grams, 0)::BIGINT AS dup_grams,
       round(CASE WHEN coalesce(s.n_grams, 0) > 0
                  THEN s.dup_grams * 1.0 / s.n_grams ELSE 0.0 END, 6)
         AS crossdoc_dup_frac
FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
""".replace("{grams}", _rep_grams_sql(_XDOC_N)),
    doc="cross-document duplicated n-gram mass (RefinedWeb-style "
        f"filter): per-doc fraction of word {_XDOC_N}-gram positions "
        "whose gram occurs in at least one other doc — catches "
        "largely-copied docs below the pairwise dedup threshold; "
        "postings explode + gram-key df aggregation + join back, "
        "never pairs",
)
def crossdoc_dup_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.operators.quality import (
        crossdoc_dup_ngrams,
    )

    docs = load_table(spark, sf_dir, "documents")
    # exact_strings=True: the correctness gate compares against the
    # string-keyed oracle above, so keep the gated plan collision-free;
    # the bench exercises the xxhash64 scale default (r8 ADVICE).
    return crossdoc_dup_ngrams(docs, n=_XDOC_N, exact_strings=True)


_F_MIN_WORDS = 20
_F_MAX_TOP2 = 0.1
_F_MIN_ENT = 2.8
_F_MIN_QUALITY = 0.55

_FUNNEL_ORACLE = f"""
WITH rep AS ({_REPETITION_ORACLE}),
m AS (
  SELECT doc_id,
         len({_WORDS_ALL})::DOUBLE AS n_words,
         length(text)::DOUBLE AS n_chars,
         (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\-]', '', 'g')))::DOUBLE AS punct,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE AS digits,
         len(list_filter({_WORDS_ALL},
             w -> list_contains([{", ".join(f"'{w}'" for w in STOPWORDS['en'])}], w)))::DOUBLE AS n_stop,
         len(list_distinct({_WORDS_ALL}))::DOUBLE AS n_uniq
  FROM documents
), q AS (
  SELECT doc_id, n_words::BIGINT AS n_words,
         round(least(n_words / 100.0, 1.0) * 0.25
               + (CASE WHEN n_words > 0 THEN n_uniq / n_words ELSE 0.0 END) * 0.25
               + least((CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END) * 4, 1.0) * 0.25
               + greatest(0.0, 1.0
                          - (CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END) * 5
                          - (CASE WHEN n_chars > 0 THEN digits / n_chars ELSE 0.0 END) * 5) * 0.25,
               6) AS quality
  FROM m
), flags AS (
  SELECT q.doc_id,
         q.n_words >= {_F_MIN_WORDS} AS g1,
         rep.top_2gram_frac <= {_F_MAX_TOP2} AS g2,
         rep.unigram_entropy >= {_F_MIN_ENT} AS g3,
         q.quality >= {_F_MIN_QUALITY} AS g4
  FROM q JOIN rep ON rep.doc_id = q.doc_id
), s AS (
  SELECT count(*)::BIGINT AS n0,
         sum(CASE WHEN g1 THEN 1 ELSE 0 END)::BIGINT AS s1,
         sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END)::BIGINT AS s2,
         sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)::BIGINT AS s3,
         sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)::BIGINT AS s4
  FROM flags
)
SELECT stage, gate, n_in, n_out, n_in - n_out AS n_dropped,
       round(CASE WHEN n_in > 0 THEN (n_in - n_out) * 1.0 / n_in
                  ELSE 0.0 END, 6) AS drop_frac
FROM (
  SELECT 1::BIGINT AS stage, 'min_words_{_F_MIN_WORDS}' AS gate,
         n0 AS n_in, s1 AS n_out FROM s
  UNION ALL
  SELECT 2, 'top_2gram_frac_le_{_F_MAX_TOP2}', s1, s2 FROM s
  UNION ALL
  SELECT 3, 'unigram_entropy_ge_{_F_MIN_ENT}', s2, s3 FROM s
  UNION ALL
  SELECT 4, 'quality_ge_{_F_MIN_QUALITY}', s3, s4 FROM s
)
"""


@register(
    "corpus_filter_funnel",
    oracle=_FUNNEL_ORACLE,
    doc="the per-gate survival report a pretraining filter pipeline "
        "emits: four chained gates (min words, top-bigram repetition "
        "cap, unigram-entropy floor, composite quality floor) with "
        "n_in/n_out/n_dropped/drop_frac per stage — per-doc flags in "
        "one projection + one global aggregate, report rows from a "
        "1-row explode (no per-gate rescans)",
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.operators.quality import (
        repetition_metrics,
    )

    docs = load_table(spark, sf_dir, "documents")
    m = quality_metrics(F.col("text"))
    per_doc = docs.select(
        "doc_id", m["n_words"].alias("n_words"),
        F.round(quality_score(F.col("text"), metrics=m), 6).alias("quality"))
    rep = repetition_metrics(docs).select(
        "doc_id", "top_2gram_frac", "unigram_entropy")
    flags = (per_doc.join(rep, "doc_id")
             .select((F.col("n_words") >= _F_MIN_WORDS).alias("g1"),
                     (F.col("top_2gram_frac") <= _F_MAX_TOP2).alias("g2"),
                     (F.col("unigram_entropy") >= _F_MIN_ENT).alias("g3"),
                     (F.col("quality") >= _F_MIN_QUALITY).alias("g4")))
    s = flags.agg(
        F.count("*").cast("long").alias("n0"),
        F.sum(F.col("g1").cast("long")).alias("s1"),
        F.sum((F.col("g1") & F.col("g2")).cast("long")).alias("s2"),
        F.sum((F.col("g1") & F.col("g2") & F.col("g3")).cast("long"))
        .alias("s3"),
        F.sum((F.col("g1") & F.col("g2") & F.col("g3") & F.col("g4"))
              .cast("long")).alias("s4"))
    stages = F.array(
        F.struct(F.lit(1).cast("long").alias("stage"),
                 F.lit(f"min_words_{_F_MIN_WORDS}").alias("gate"),
                 F.col("n0").alias("n_in"), F.col("s1").alias("n_out")),
        F.struct(F.lit(2).cast("long").alias("stage"),
                 F.lit(f"top_2gram_frac_le_{_F_MAX_TOP2}").alias("gate"),
                 F.col("s1").alias("n_in"), F.col("s2").alias("n_out")),
        F.struct(F.lit(3).cast("long").alias("stage"),
                 F.lit(f"unigram_entropy_ge_{_F_MIN_ENT}").alias("gate"),
                 F.col("s2").alias("n_in"), F.col("s3").alias("n_out")),
        F.struct(F.lit(4).cast("long").alias("stage"),
                 F.lit(f"quality_ge_{_F_MIN_QUALITY}").alias("gate"),
                 F.col("s3").alias("n_in"), F.col("s4").alias("n_out")))
    return (s.select(F.explode(stages).alias("x"))
            .select("x.stage", "x.gate", "x.n_in", "x.n_out",
                    (F.col("x.n_in") - F.col("x.n_out")).alias("n_dropped"),
                    F.round(F.when(F.col("x.n_in") > 0,
                                   (F.col("x.n_in") - F.col("x.n_out"))
                                   / F.col("x.n_in")).otherwise(0.0), 6)
                    .alias("drop_frac")))


_GRAM = 5
_MOD = 16


@register(
    "text_fingerprint_winnow",
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) - {_GRAM} + 2),
                               i -> substr(text, i, {_GRAM}))) AS gram
  FROM documents WHERE length(text) >= {_GRAM}
), h AS (
  SELECT DISTINCT doc_id, {stable_hash_sql('gram')} AS gram_hash FROM g
)
SELECT doc_id, gram_hash FROM h WHERE gram_hash % {_MOD} = 0
""",
    doc="document fingerprinting: mod-sampled char-5-gram hash sketch "
        "(winnowing-style, rolling window)",
)
def text_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.length("text") >= _GRAM))
    grams = docs.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("text") - _GRAM + 1),
            lambda i: F.col("text").substr(i, F.lit(_GRAM)),
        )).alias("gram"))
    hashed = grams.select("doc_id",
                          stable_hash64(F.col("gram")).alias("gram_hash")).distinct()
    return hashed.filter(F.col("gram_hash") % _MOD == 0)


_KW_K = 3


@register(
    "doc_keywords_tfidf",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest({_WORDS_ALL}) AS term FROM documents
), postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM words GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM postings GROUP BY term
), stats AS (
  SELECT count(*)::DOUBLE AS n FROM documents
), scored AS (
  SELECT p.doc_id, p.term,
         round(p.tf * (ln((1 + s.n) / (1 + d.df)) + 1), 6) AS tfidf
  FROM postings p JOIN dfreq d USING (term) CROSS JOIN stats s
), ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= {_KW_K}
""",
    doc="per-doc keyword extraction: top-3 terms by smooth TF-IDF "
        "(sklearn's smooth_idf form) off the shared postings shape — "
        "the keyword-metadata tagging step of a corpus pipeline "
        "(reference metadata extraction: "
        "day_10/processors/metadata_extractor.py)",
)
def doc_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.operators.bm25 import tfidf_topk_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk_terms(docs, k=_KW_K)


_VOCAB_K = 100


@register(
    "vocab_coverage_topk",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest({_WORDS_ALL}) AS term FROM documents
), tt AS (
  SELECT term, count(*)::BIGINT AS n_occ FROM words GROUP BY term
), tot AS (
  SELECT sum(n_occ)::DOUBLE AS total FROM tt
), ranked AS (
  SELECT term, n_occ,
         row_number() OVER (ORDER BY n_occ DESC, term ASC) AS rank
  FROM tt QUALIFY rank <= {_VOCAB_K}
)
SELECT term, n_occ, rank,
       round(sum(n_occ) OVER (ORDER BY rank) / total, 6) AS coverage
FROM ranked CROSS JOIN tot
""",
    doc="corpus vocabulary head: top-100 terms by occurrence with "
        "cumulative token-coverage share (the curve tokenizer/BPE "
        "vocab sizing reads); hash agg + TakeOrderedAndProject + "
        "window over the k survivors only",
)
def vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.operators.bm25 import vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs, k=_VOCAB_K)


_PMI_MIN_DF = 5
_PMI_MAX_DF_FRAC = 0.95
_PMI_MIN_PAIR = 5
_PMI_TOPK = 50


@register(
    "term_cooccurrence_pmi",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         list_distinct(list_filter(
           regexp_split_to_array(lower(text), '\\s+'), w -> w <> ''))
           AS lw
  FROM documents
), posts AS (
  SELECT doc_id, unnest(lw) AS term FROM d
), nd AS (
  SELECT count(*)::DOUBLE AS n_docs FROM documents
), dfc AS (
  SELECT term, count(*)::BIGINT AS df FROM posts GROUP BY term
), keep AS (
  SELECT term, df FROM dfc CROSS JOIN nd
  WHERE df >= {_PMI_MIN_DF} AND df <= {_PMI_MAX_DF_FRAC} * n_docs
), gated AS (
  SELECT p.doc_id, p.term, k.df FROM posts p JOIN keep k USING (term)
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         a.df AS df_a, b.df AS df_b, count(*)::BIGINT AS n_ab
  FROM gated a JOIN gated b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= {_PMI_MIN_PAIR}
)
SELECT term_a, term_b, n_ab, df_a, df_b,
       round(ln((n_ab::DOUBLE * n_docs) / (df_a * df_b)), 6) AS pmi
FROM pairs CROSS JOIN nd
ORDER BY pmi DESC, term_a ASC, term_b ASC
LIMIT {_PMI_TOPK}
""",
    doc="document-level term co-occurrence PMI (collocation mining): "
        "df-gated postings self-join on doc_id — the [min_df, max_df] "
        "gate BEFORE the pair fan-out is what keeps the quadratic "
        "per-doc explosion and hot stop-word keys out of the shuffle",
)
def term_cooccurrence_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_vector_db___ai_spark.operators.bm25 import (
        term_cooccurrence_pmi,
    )

    docs = load_table(spark, sf_dir, "documents")
    return term_cooccurrence_pmi(docs, min_df=_PMI_MIN_DF,
                                 max_df_frac=_PMI_MAX_DF_FRAC,
                                 min_pair=_PMI_MIN_PAIR, k=_PMI_TOPK)
