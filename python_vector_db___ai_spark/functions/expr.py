"""Expression combinators.

``let`` exists because Spark SQL has no let-binding and interpreted
higher-order functions have no loop-invariant hoisting: a computed
Column referenced inside a ``transform``/``filter`` lambda is
RE-EVALUATED on every element.  For the shingle family that turned
n-gram construction quadratic — ``transform(sequence(1, size(words) -
k), i -> slice(words, i, n))`` with ``words = filter(split(lower(
text)))`` re-tokenized the whole document once per gram position
(O(words²) per doc; lambda bodies are interpreted, so neither
whole-stage codegen's common-subexpression elimination nor the
ProjectExec subexpression runtime applies).  Measured on the 250k-doc
bench corpus: the cross-doc gram explode dropped 9.9 → 4.3 s from
this binding alone, identical results.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` ONCE per row and bind it as a lambda variable
    in ``body`` — Spark's missing let-expression.

    Implemented as ``transform(array(value), v -> body(v))[0]``: the
    single-element array materializes ``value`` exactly once, and every
    reference inside ``body`` is a bound-variable lookup instead of a
    re-evaluation of the producing expression tree.  NULL flows through
    unchanged (the lambda receives NULL; ``body`` sees the same value
    semantics as inline substitution — parity pinned in
    ``tests/test_dedup.py``).
    """
    return F.transform(F.array(value), body)[0]
