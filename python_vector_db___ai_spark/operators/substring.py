"""Exact-substring (span-level) corpus deduplication.

The pipeline step from "Deduplicating Training Data Makes Language
Models Better" (Lee et al. 2021): document-level dedup misses the far
larger mass of text duplicated *inside* otherwise-distinct documents
(boilerplate, licenses, quoted passages).  The paper removes every
repeated 50-token substring via a suffix array; the standard
distributed approximation — used here — tiles each document into
non-overlapping ``window``-word spans and removes every span whose
exact text occurs elsewhere in the corpus, keeping the single
globally-first occurrence.

Scale shape (the whole point at 100 TB):

* one expression pass builds the spans per doc (``sequence`` +
  ``slice`` + ``array_join`` — no explode-then-regroup);
* the duplicate test is ONE hash aggregation on the span key — the
  same postings shape as MinHash banding, cost linear in corpus
  tokens, map-side partial aggregation applies;
* the keeper choice is ``min(struct(doc_id, span_id))`` inside that
  aggregate — no window over the (skewed) span key, so a span
  repeated a million times costs one combiner chain, not a
  single-partition sort;
* one plain equi-join back on the span key, then a per-doc aggregate
  to reassemble the residual text.  (At test scale AQE turns this
  join into a broadcast — the keepers frame is one row per distinct
  corpus span, so at 100-TB scale it does NOT fit a broadcast and the
  join runs as a shuffled equi-join on the span key; both shapes are
  correct and linear, the broadcast is an AQE bonus, not a design
  requirement.)

No UDFs anywhere; the DuckDB oracle in ``plans/q_tokenize.py``
replays the identical keep rule.

Reference analog: none (the reference dedups whole vectors/documents,
e.g. ``day_8/vector_database.py`` exact-id upsert); this is the
training-data extension the task brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.dedup import words_col


def span_dedup(docs: DataFrame, window: int = 10,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document span-dedup report.

    Tiles ``text_col`` into non-overlapping ``window``-word spans,
    drops every span whose exact text also occurs at an earlier
    (doc_id, span_id) anywhere in the corpus, and returns one row per
    document::

        (doc_id, n_spans, n_dropped, words_dropped, chars_dropped,
         residual_hash)

    ``residual_hash`` is ``md5`` of the kept spans re-joined in order
    — the deduplicated document body, hash-compared cross-engine
    without shipping the full text through the checker.
    ``words_dropped`` counts the tokens inside dropped spans (the
    ragged tail span can hold fewer than ``window`` words), so
    downstream token accounting is exact.
    """
    from python_vector_db___ai_spark.functions.expr import let

    words = words_col(F.col(text_col))

    def _spans(ws):
        # let-bound words (functions/expr.py): the span-slicing lambda
        # must not re-tokenize the document once per span.
        n_spans = F.ceil(F.size(ws) / F.lit(window)).cast("int")
        return F.when(
            F.size(ws) > 0,
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.array_join(
                    F.slice(ws, i * window + 1, window), " "),
            )).otherwise(F.array().cast("array<string>"))

    spans_arr = let(words, _spans)

    spans = docs.select(
        F.col(id_col),
        F.posexplode_outer(spans_arr).alias("span_id", "span"))

    # Duplicate groups + keeper in ONE aggregate on the span key.
    keepers = (spans
               .filter(F.col("span").isNotNull())
               .groupBy("span")
               .agg(F.min(F.struct(id_col, "span_id")).alias("_keep")))

    tagged = (spans.join(keepers, "span", "left")
              .withColumn(
                  "_kept",
                  F.col("span").isNull()  # empty doc: nothing to drop
                  | ((F.col(f"_keep.{id_col}") == F.col(id_col))
                     & (F.col("_keep.span_id") == F.col("span_id")))))

    per_doc = (tagged.groupBy(id_col).agg(
        F.sum(F.when(F.col("span").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_spans"),
        F.sum(F.when(~F.col("_kept"), 1).otherwise(0))
        .cast("long").alias("n_dropped"),
        F.sum(F.when(~F.col("_kept"),
                     F.size(F.split(F.col("span"), " "))).otherwise(0))
        .cast("long").alias("words_dropped"),
        F.sum(F.when(~F.col("_kept"), F.length("span")).otherwise(0))
        .cast("long").alias("chars_dropped"),
        F.md5(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(F.col("_kept") & F.col("span").isNotNull(),
                           F.struct("span_id", "span")))),
                lambda s: s["span"]),
            " ")).alias("residual_hash")))
    return per_doc.select(id_col, "n_spans", "n_dropped", "words_dropped",
                          "chars_dropped", "residual_hash")
