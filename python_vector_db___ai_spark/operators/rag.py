"""RAG assembly operators (SURVEY §2.11 F19-F21, §3.2 lifecycle).

``retrieve -> build context under a length budget -> format prompt ->
answer`` (day_12/src/main.py:351-453).  Context building is the only
interesting relational piece: rank-ordered concatenation with a running
length cutoff — a window cumsum + filter + ordered string_agg, no UDF.
The LLM call itself stays outside the engine (the reference's
rule-based mock stands in, F21).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_TEMPLATE = (
    "Answer the question based on the context below.\n\n"
    "Context:\n{context}\n\nQuestion: {question}\n\nAnswer:")


def build_context(ranked_docs: DataFrame, max_length: int = 2000,
                  query_col: str = "query_id", rank_col: str = "rank",
                  text_col: str = "text", sep: str = "\n\n") -> DataFrame:
    """F19: per query, concatenate retrieved docs in rank order,
    stopping before the first doc that would push total chars past
    ``max_length`` (day_12/src/main.py:419-438 budget semantics).

    Separator chars count toward the budget, like the reference's
    ``"\\n\\n".join``.
    """
    w = (Window.partitionBy(query_col).orderBy(rank_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    sep_len = len(sep)
    with_cum = ranked_docs.withColumn(
        "_cum",
        F.sum(F.length(text_col) + sep_len).over(w) - sep_len)
    kept = with_cum.filter(F.col("_cum") <= max_length)
    return (kept.groupBy(query_col)
            .agg(F.concat_ws(
                     sep,
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col(rank_col).alias("r"),
                                      F.col(text_col).alias("t")))),
                         lambda s: s["t"])).alias("context"),
                 F.count("*").cast("long").alias("n_docs"),
                 F.max("_cum").cast("long").alias("context_chars")))


def format_prompt(df: DataFrame, template: str = DEFAULT_TEMPLATE,
                  context_col: str = "context",
                  question_col: str = "question") -> DataFrame:
    """F20 prompt templating (day_11/main.py:30-62) via format_string —
    '{context}'/'{question}' placeholders, order-independent."""
    fmt = template.replace("%", "%%") \
                  .replace("{context}", "%s").replace("{question}", "%s")
    # Build argument order from placeholder positions in the template.
    order = sorted(
        [(template.find("{context}"), F.col(context_col)),
         (template.find("{question}"), F.col(question_col))])
    return df.withColumn(
        "prompt", F.format_string(fmt, *[c for _, c in order]))


class PromptLibrary:
    """F20/§2.12 template registry (day_11/main.py:64-91
    ``PromptLibrary.add_template``): named templates with declared
    variables; rendering validates that every placeholder is a known
    DataFrame column before building the expression."""

    def __init__(self) -> None:
        import re

        self._re = re
        self.templates: dict[str, str] = {"rag_default": DEFAULT_TEMPLATE}

    def add_template(self, name: str, template: str) -> None:
        if name in self.templates:
            raise ValueError(f"template {name!r} already registered")
        self.templates[name] = template

    def variables(self, name: str) -> list[str]:
        return self._re.findall(r"\{(\w+)\}", self.templates[name])

    def render(self, df: DataFrame, name: str,
               out_col: str = "prompt") -> DataFrame:
        template = self.templates[name]
        missing = [v for v in self.variables(name) if v not in df.columns]
        if missing:
            raise ValueError(f"missing columns for template {name!r}: {missing}")
        fmt = template.replace("%", "%%")
        order = []
        for m in self._re.finditer(r"\{(\w+)\}", template):
            order.append(F.col(m.group(1)))
        fmt = self._re.sub(r"\{\w+\}", "%s", fmt)
        return df.withColumn(out_col, F.format_string(fmt, *order))


def mock_answer(question: Column, context: Column) -> Column:
    """F21 rule-based mock answerer (day_12/src/main.py:291-317): keyword
    cascade over the question, grounded-sounding fallback."""
    q = F.lower(question)
    return (
        F.when(q.contains("what") | q.contains("define"),
               F.concat(F.lit("Based on the context: "),
                        F.substring(context, 1, 200)))
        .when(q.contains("how"),
              F.concat(F.lit("The process works as follows: "),
                       F.substring(context, 1, 200)))
        .when(q.contains("why"),
              F.concat(F.lit("The reason is: "), F.substring(context, 1, 200)))
        .otherwise(F.concat(F.lit("According to the retrieved documents: "),
                            F.substring(context, 1, 150))))
