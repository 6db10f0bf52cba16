"""Unit tests for functions/text.py on hand-built strings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.text import (
    clean_text,
    detect_language,
    nfkc_normalize,
    quality_metrics,
    quality_score,
    text_metadata,
    token_counts,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(col.alias("v")).collect()[0].v


def test_clean_text_chain(spark):
    out = _one(spark, "Hello  â€™world !!   How ,are you\n\n\n\nOk",
               clean_text(F.col("text")))
    assert "â€™" not in out
    assert "  " not in out
    assert "!!" not in out
    assert "\n\n\n" not in out


def test_text_metadata(spark):
    md = text_metadata(F.col("text"))
    text = "# Title\n\npara one\n\n- item\n\n```code```\nlast line"
    got = {k: _one(spark, text, v) for k, v in md.items()}
    assert got["has_headers"] and got["has_lists"] and got["has_code"]
    assert got["paragraph_count"] == 4
    assert got["word_count"] == 9


def test_detect_language(spark):
    col = detect_language(F.col("text"))
    assert _one(spark, "the cat is on the mat and it is happy", col) == "en"
    assert _one(spark, "el perro es grande y la casa es de madera", col) == "es"
    assert _one(spark, "der hund ist groß und die katze ist klein", col) == "de"
    assert _one(spark, "le chien est dans la maison pour le dîner", col) == "fr"
    assert _one(spark, "xyzzy plugh quux", col) == "unknown"


def test_quality_score_ordering(spark):
    col = quality_score(F.col("text"))
    good = ("the quick brown fox jumps over the lazy dog and runs through "
            "the green field with a happy bark in the warm morning sun")
    noisy = "!!! ??? ,,, 123 456 789 !!! ??? ... 000 111 222"
    assert _one(spark, good, col) > _one(spark, noisy, col)
    score = _one(spark, good, col)
    assert 0.0 <= score <= 1.0


def test_token_counts(spark):
    tc = token_counts(F.col("text"))
    text = "hello world, it's 42 degrees"
    got = {k: _one(spark, text, v) for k, v in tc.items()}
    assert got["ws_tokens"] == 5
    # hello/world/,/it/'/s/4/2/degrees
    assert got["regex_tokens"] == 9
    assert got["approx_bpe_tokens"] == 7


def test_nfkc_normalize(spark):
    # ﬁ ligature (U+FB01) -> 'fi' under NFKC
    out = _one(spark, "ﬁle", nfkc_normalize(F.col("text")))
    assert out == "file"


def test_pii_counts_and_redaction(spark):
    from python_vector_db___ai_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "mail me at jane.doe+x@example.org or call 415-555-1234"),
         (2, "server 192.168.1.77 holds ssn 123-45-6789"),
         (3, "nothing sensitive here")],
        ["doc_id", "text"])
    counts = pii_counts(F.col("text"))
    got = {r.doc_id: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in counts.items()],
        redact_pii(F.col("text")).alias("clean")).collect()}
    assert got[1].email == 1 and got[1].phone == 1
    assert got[2].ipv4 == 1 and got[2].ssn == 1
    assert got[3].email == got[3].phone == got[3].ipv4 == got[3].ssn == 0
    assert "[email]" in got[1].clean and "example.org" not in got[1].clean
    assert "[phone]" in got[1].clean
    assert "[ipv4]" in got[2].clean and "[ssn]" in got[2].clean
    assert got[3].clean == "nothing sensitive here"


def test_pii_unseparated_phone_and_ip_ordering(spark):
    """Unseparated 10-digit phones are caught, and IPv4 redaction runs
    before phone so a dotted quad is never partially consumed as a
    phone number (mangled remainders)."""
    from python_vector_db___ai_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "call 4155551234 now"),
         (2, "host 10.123.45.78 up"),
         (3, "year 2023 and 123456789 are not phones"),
         (4, "call (415) 555-1234 now"),
         (5, "call +1-415-555-1234 now")],
        ["doc_id", "text"])
    counts = pii_counts(F.col("text"))
    got = {r.doc_id: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in counts.items()],
        redact_pii(F.col("text")).alias("clean")).collect()}
    assert got[1].phone == 1 and "[phone]" in got[1].clean
    assert "4155551234" not in got[1].clean
    assert got[2].ipv4 == 1
    assert got[2].clean == "host [ipv4] up"      # no phone bite into the IP
    assert got[3].phone == 0
    assert got[3].clean == "year 2023 and 123456789 are not phones"
    # parenthesized and +country forms redact from the FIRST char —
    # no '(' or '+' remnant left behind
    assert got[4].clean == "call [phone] now"
    assert got[5].clean == "call [phone] now"


def test_pii_letter_adjacent_separated_phone_still_redacts(spark):
    """Separated phones glued to letters (where \\b can't match) are
    still scrubbed — prefer a false positive over a leak."""
    from python_vector_db___ai_spark.functions.text import redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "id415-555-1234"), (2, "call 415-555-1234now")],
        ["doc_id", "text"])
    got = {r.doc_id: r.clean for r in
           df.select("doc_id",
                     redact_pii(F.col("text")).alias("clean")).collect()}
    assert got[1] == "id[phone]"
    assert got[2] == "call [phone]now"


def test_repetition_metrics_hand_computed(spark):
    """Gopher-rule repetition metrics against hand-computed values."""
    import math

    from python_vector_db___ai_spark.operators.quality import (
        repetition_metrics,
    )

    docs = spark.createDataFrame(
        [
            # 3 lines, "dup" twice -> dup_line_frac 2/3; words
            # [a, b, dup, dup] -> bigrams {a b, b dup, dup dup} each
            # once (top 1/3); entropy of {a:1, b:1, dup:2}
            (1, "a b\ndup\ndup"),
            # all-unique words, no dup lines, no 5-gram repeats
            (2, "one two three four five six"),
            # one word repeated -> entropy 0, top_2gram_frac 1.0,
            # 5-grams "x x x x x" x2 both duplicated -> frac 1.0
            (3, "x x x x x x"),
            (4, ""),                      # empty doc keeps its row
        ],
        "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_metrics(docs).collect()}

    assert got[1].n_lines == 3
    assert got[1].dup_line_frac == pytest.approx(2 / 3, abs=1e-6)
    assert got[1].dup_line_char_frac == pytest.approx(6 / 9, abs=1e-6)
    assert got[1].top_2gram_frac == pytest.approx(1 / 3, abs=1e-6)
    assert got[1].unigram_entropy == pytest.approx(
        -(2 * 0.25 * math.log(0.25) + 0.5 * math.log(0.5)), abs=1e-6)

    assert got[2].dup_line_frac == 0.0
    assert got[2].top_2gram_frac == pytest.approx(1 / 5, abs=1e-6)
    assert got[2].dup_5gram_frac == 0.0
    assert got[2].unigram_entropy == pytest.approx(math.log(6), abs=1e-6)

    assert got[3].unigram_entropy == 0.0
    assert got[3].top_2gram_frac == 1.0
    assert got[3].dup_5gram_frac == 1.0

    assert got[4].n_lines == 0
    assert got[4].unigram_entropy == 0.0
    assert got[4].dup_line_frac == 0.0


def test_crossdoc_dup_ngrams_hand_computed(spark):
    """Cross-doc duplicated n-gram mass with n=3 on a tiny corpus."""
    from python_vector_db___ai_spark.operators.quality import (
        crossdoc_dup_ngrams,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: "a b c", "b c d"
            (2, "a b c x"),        # grams: "a b c", "b c x"
            (3, "q r s t"),        # unique grams
            (4, "zz"),             # too short -> 0 grams, row kept
        ],
        "doc_id long, text string")
    got = {r.doc_id: r for r in crossdoc_dup_ngrams(docs, n=3).collect()}
    # "a b c" is shared by docs 1 and 2 -> 1 of 2 positions each
    assert (got[1].n_grams, got[1].dup_grams) == (2, 1)
    assert got[1].crossdoc_dup_frac == pytest.approx(0.5)
    assert got[2].crossdoc_dup_frac == pytest.approx(0.5)
    assert (got[3].dup_grams, got[3].crossdoc_dup_frac) == (0, 0.0)
    assert (got[4].n_grams, got[4].crossdoc_dup_frac) == (0, 0.0)


def test_crossdoc_dup_ngrams_within_doc_repeats_not_dup(spark):
    """A gram repeated INSIDE one doc but present in no other doc is
    not cross-doc duplicated — the solo-mass subtraction must credit
    all of its positions (c > 1 with df == 1) back to the doc."""
    from python_vector_db___ai_spark.operators.quality import (
        crossdoc_dup_ngrams,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "x y z w")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in crossdoc_dup_ngrams(docs, n=3).collect()}
    assert (got[1].n_grams, got[1].dup_grams) == (7, 0)
    assert (got[2].n_grams, got[2].dup_grams) == (2, 0)


def test_crossdoc_dup_ngrams_hashed_equals_string_keyed(spark):
    """Differential: the xxhash64-keyed scale plan returns exactly the
    string-keyed (collision-free) form on the fixture corpus."""
    from python_vector_db___ai_spark.operators.quality import (
        crossdoc_dup_ngrams,
    )
    from python_vector_db___ai_spark.session import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    fast = sorted(map(tuple, crossdoc_dup_ngrams(docs, n=8).collect()))
    exact = sorted(map(tuple, crossdoc_dup_ngrams(
        docs, n=8, exact_strings=True).collect()))
    assert fast == exact


def test_repetition_map_only_equals_agg_form(spark):
    """The round-7 map-only Arrow pass must be row-identical to the
    explode + hash-agg differential reference — on the real corpus AND
    on edge docs (empty, whitespace-only, tab-only line, duplicated
    lines, sub-n-gram shorts)."""
    from python_vector_db___ai_spark.operators.quality import (
        repetition_metrics,
        repetition_metrics_agg,
    )
    from python_vector_db___ai_spark.session import load_table
    from tests.conftest import SF_DIR

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    docs = load_table(spark, SF_DIR, "documents")
    assert rows(repetition_metrics(docs)) == \
        rows(repetition_metrics_agg(docs))

    edge = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\t"), (4, "a\na\na"),
         (5, "one"), (6, "w w w w"), (7, "A b\nA B\na b"),
         (8, None)],
        "doc_id long, text string")
    assert rows(repetition_metrics(edge)) == \
        rows(repetition_metrics_agg(edge))


def test_repetition_map_only_plan_is_shuffle_free(spark):
    from python_vector_db___ai_spark.operators.quality import (
        repetition_metrics,
    )
    from python_vector_db___ai_spark.plans.explain import (
        count_exchanges,
        formatted_plan,
    )
    from python_vector_db___ai_spark.session import load_table
    from tests.conftest import SF_DIR

    spark.catalog.clearCache()
    df = repetition_metrics(load_table(spark, SF_DIR, "documents"))
    assert count_exchanges(df) == 0, formatted_plan(df)


def test_crossdoc_auto_policy_on_empty_corpus(spark):
    """The 'auto' sizing aggregate sees zero gram positions on an
    empty/short corpus: N must clamp to defaultParallelism (never 0)
    and the result must still keep one all-zero row per short doc."""
    from python_vector_db___ai_spark.operators.quality import (
        crossdoc_dup_ngrams,
    )

    docs = spark.createDataFrame([(1, "too short")],
                                 "doc_id long, text string")
    info: dict = {}
    got = crossdoc_dup_ngrams(docs, n=8, plan_info=info).collect()
    assert info["total_grams"] == 0
    assert info["shuffle_partitions"] == \
        spark.sparkContext.defaultParallelism
    assert len(got) == 1 and got[0].n_grams == 0

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert crossdoc_dup_ngrams(empty, n=8).count() == 0
