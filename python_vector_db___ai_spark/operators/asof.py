"""As-of (temporal) join — the time-series operator Spark SQL lacks
natively (SURVEY §2.4 joins family, beyond-reference time-series
coverage; DuckDB/kdb expose it as ``ASOF JOIN``).

For each left row, find the single right row with the same key whose
timestamp is the greatest one ``<=`` the left timestamp (backward
as-of).  The naive formulation is an inequality θ-join plus an argmax
— quadratic per key.  The Spark-native shape used here is the
**union-and-carry** pattern:

1. union the two sides into one frame tagged ``_side`` (right = 0,
   left = 1), carrying the right side's payload as a struct;
2. one window per key ordered by ``(ts, _side)`` with
   ``last(payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — each left row
   picks up the most recent right payload at or before its timestamp
   (right sorts before left on equal ts, making the match inclusive);
3. keep the left rows.

Cost: ONE shuffle on the join key and a per-key sort — linear in
|L| + |R|, no pair blowup, and AQE handles key skew like any other
window.  At 100 TB both sides usually arrive time-bucketed; the
shuffle co-partitions them in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Backward as-of join: every ``left`` row gains the most recent
    ``right`` row per key with ``right_ts <= left_ts`` (inclusive).

    ``right`` must be unique per ``(on, right_ts)`` — pre-aggregate it
    otherwise (the registered query dedupes with ``min(event_id)``),
    since "the" most recent right row is ill-defined under ties.
    Matched right columns come back as ``{prefix}{col}`` (and
    ``{prefix}{right_ts}`` for the match timestamp); unmatched left
    rows keep nulls, like a left join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols or [c for c in right.columns
                           if c not in keys and c != right_ts]
    payload = F.struct(F.col(right_ts).alias("_mts"),
                       *[F.col(c) for c in rcols])
    r = right.select(*keys, F.col(right_ts).alias("_ts"),
                     F.lit(0).alias("_side"), payload.alias("_rpay"))
    rpay_type = r.schema["_rpay"].dataType.simpleString()
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l = left.select(*keys, F.col(left_ts).alias("_ts"),
                    F.lit(1).alias("_side"),
                    F.lit(None).cast(rpay_type).alias("_rpay"),
                    *lcols)
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*keys).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))
    out_cols = ([F.col(k) for k in keys]
                + [F.col("_ts").alias(left_ts)]
                + [F.col(c) for c in lcols]
                + [F.col("_m._mts").alias(f"{prefix}{right_ts}")]
                + [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in rcols])
    return carried.select(*out_cols)
