"""PySpark-native analytics engine with the query surface of
``sai111-design/Python-Vector-DB---AI`` (vector similarity search,
metadata filtering, top-k, document CRUD, chunking/embedding dataflow,
retrieval-quality analytics) plus large-scale training-data-pipeline
operators (dedup, ANN, text analysis, multimodal plumbing).

Everything is expressed Spark-first: DataFrame/SQL declarative plans that
Catalyst/Tungsten optimize (predicate pushdown, broadcast joins,
whole-stage codegen).  Pandas UDFs are used only where built-in
expressions genuinely cannot express the semantics (model inference,
stateful per-document chunking).
"""

__version__ = "0.1.0"

from python_vector_db___ai_spark.session import get_spark  # noqa: F401
