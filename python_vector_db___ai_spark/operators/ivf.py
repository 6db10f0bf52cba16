"""IVF (inverted-file) approximate nearest-neighbor search + recall
harness (SURVEY §2.9 X2/X5/X6/X7).

The reference's ``IndexIVFFlat`` (day_6/day6_complete.py:102-130:
KMeans quantizer, nlist clusters, search probes nprobe=10) maps to
Spark as a **table-layout choice, not an index structure**:

* centroids = per-cluster mean vectors — one posexplode + two hash
  aggregations (distributed; never collects vectors to the driver);
* at query time, score each query against the (tiny, broadcast)
  centroid table, keep the top ``nprobe`` clusters, then equi-join the
  corpus on ``cluster_id`` — when the corpus is written partitioned or
  bucketed by ``cluster_id``, Catalyst turns that join into partition
  pruning, so a 1000-executor scan reads only nprobe/nlist of the data;
* the exact scan (operators/search.knn_join) is the recall oracle
  (X6, day_6/day6_complete.py:249-263).

Cluster assignments come either from an existing column (the test
tables ship a ``label``) or from MLlib KMeans (:func:`kmeans_assign`,
mirroring the FAISS quantizer training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_vector_db___ai_spark.functions.inline import inline_table
from python_vector_db___ai_spark.functions.vector import DESCENDING_METRICS
from python_vector_db___ai_spark.operators.search import score_column


def build_centroids(corpus: DataFrame, cluster_col: str = "label",
                    vec_col: str = "embedding",
                    round_to: int | None = 6) -> DataFrame:
    """Per-cluster mean vector -> ``(cluster_col, centroid array<double>)``.

    ``round_to`` rounds each component so downstream probe scores are
    reproducible across engines and run-to-run partial-sum orderings.
    """
    pos = corpus.select(
        F.col(cluster_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"))
    cp = (pos.groupBy(cluster_col, "pos")
          .agg(F.avg("val").alias("c")))
    if round_to is not None:
        cp = cp.withColumn("c", F.round("c", round_to))
    return (cp.groupBy(cluster_col)
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select(F.col(cluster_col),
                    F.transform("pc", lambda s: s["c"]).alias("centroid")))


def probe_clusters(queries: DataFrame, centroids: DataFrame, nprobe: int = 3,
                   metric: str = "cosine", query_id: str = "query_id",
                   query_vec: str = "query_vec",
                   cluster_col: str = "label",
                   round_to: int | None = 6) -> DataFrame:
    """Top-``nprobe`` clusters per query (the IVF coarse quantizer step).
    Returns ``(query_id, query_vec, cluster_col)`` — tiny, broadcastable.

    MAP-ONLY since r14 (guide §2.4): the previous form crossJoined the
    broadcast centroids and ranked with a ``row_number`` window
    partitioned by ``query_id`` — an exchange + sort of the whole
    *queries* side, which at spill-assignment scale (the embedding
    near-dup pipeline probes the full corpus) is a corpus-sized
    shuffle that exists only to pick nprobe winners out of ~nlist
    scored candidates per row.  Folding the centroid table into ONE
    broadcast array row and taking the per-row top-``nprobe`` with
    ``array_sort`` + ``slice`` removes that exchange outright.  The
    score is the same column-expression tree evaluated per array
    element (bit-identical values), the tie-break is the same
    (rounded score, then ``cluster_col`` ascending), and null scores
    order exactly as the window's default null ordering did
    (descending → nulls last, ascending → nulls first).
    """
    desc = metric in DESCENDING_METRICS

    def _scored(c):
        s, _ = score_column(metric, F.col(query_vec), c["c"])
        if round_to is not None:
            s = F.round(s, round_to)
        return F.struct(s.alias("s"), c["l"].alias("l"))

    def _cmp(a, b):
        tie = (F.when(a["l"] < b["l"], F.lit(-1))
               .when(a["l"] > b["l"], F.lit(1))
               .otherwise(F.lit(0)))
        better = a["s"] > b["s"] if desc else a["s"] < b["s"]
        worse = a["s"] < b["s"] if desc else a["s"] > b["s"]
        # window parity: desc() = nulls last, asc() = nulls first
        a_null, b_null = a["s"].isNull(), b["s"].isNull()
        return (F.when(a_null & b_null, tie)
                .when(a_null, F.lit(1) if desc else F.lit(-1))
                .when(b_null, F.lit(-1) if desc else F.lit(1))
                .when(better, F.lit(-1))
                .when(worse, F.lit(1))
                .otherwise(tie))

    cents_row = centroids.agg(
        F.array_sort(F.collect_list(F.struct(
            F.col(cluster_col).alias("l"),
            F.col("centroid").alias("c")))).alias("_cents"))
    top = F.slice(F.array_sort(F.transform(F.col("_cents"), _scored), _cmp),
                  1, nprobe)
    return (queries.crossJoin(F.broadcast(cents_row))
            .select(F.col(query_id), F.col(query_vec),
                    F.explode(top).alias("_t"))
            .select(query_id, query_vec,
                    F.col("_t")["l"].alias(cluster_col)))


def ivf_search(queries: DataFrame, corpus: DataFrame,
               centroids: DataFrame | None = None, nprobe: int = 3,
               k: int = 10, metric: str = "cosine",
               query_id: str = "query_id", query_vec: str = "query_vec",
               corpus_id: str = "id", corpus_vec: str = "embedding",
               cluster_col: str = "label",
               round_to: int | None = 6,
               impl: str = "pruned-blas",
               dedup_candidates: bool = False) -> DataFrame:
    """IVF search: probe -> prune (equi-join on cluster) -> exact score
    within the probed clusters -> per-query top-k.

    Scans ~``nprobe/nlist`` of the corpus; with the corpus partitioned
    by ``cluster_col`` the pruning happens at the scan.  ``impl="blas"``
    scores the pruned candidate pairs with a vectorized NumPy kernel
    and keeps local top-k before the final merge (same trick as
    ``search.knn_join_blas``, identical results); ``impl="expr"`` stays
    pure-expression.

    ``dedup_candidates=True`` drops duplicate (query, candidate) pairs
    before ranking — required when the corpus was spill-assigned to
    multiple clusters (:func:`assign_clusters` with ``spill > 1``), so a
    vector living in two probed clusters cannot occupy two rank slots.
    """
    if centroids is None:
        centroids = build_centroids(corpus, cluster_col, corpus_vec, round_to)
    desc_order = metric in ("cosine", "inner_product", "euclidean_similarity")
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc() if desc_order else F.col("score").asc(),
        F.col(corpus_id).asc())

    if impl == "pruned-blas":
        # The probe table is driver-small by contract (it gets
        # collected either way); for the cosine quantizer compute it
        # directly on the driver — same rounding + (score desc,
        # cluster asc) tie-break as probe_clusters — turning the
        # probe crossJoin + window + collect (two Spark jobs) into
        # one numpy matmul, so the whole search is a single job.
        if metric == "cosine":
            probe_rows = _probe_rows_driver(
                queries, centroids, nprobe, query_id, query_vec,
                cluster_col, round_to)
        else:
            probe_rows = None
        scored = _pruned_matmul_topk(
            probe_clusters(queries, centroids, nprobe, metric, query_id,
                           query_vec, cluster_col, round_to)
            if probe_rows is None else probe_rows,
            corpus, k, metric, query_id, query_vec,
            corpus_id, corpus_vec, cluster_col, round_to or 6, desc_order)
    elif impl == "blas":
        probes = probe_clusters(queries, centroids, nprobe, metric,
                                query_id, query_vec, cluster_col, round_to)
        cand = corpus.join(F.broadcast(probes), cluster_col)
        scored = _score_pairs_blas(
            cand.select(query_id, corpus_id, query_vec, corpus_vec),
            k, metric, query_id, query_vec, corpus_id, corpus_vec,
            round_to or 6, desc_order)
    else:
        probes = probe_clusters(queries, centroids, nprobe, metric,
                                query_id, query_vec, cluster_col, round_to)
        cand = corpus.join(F.broadcast(probes), cluster_col)
        score, _ = score_column(metric, F.col(query_vec), F.col(corpus_vec))
        if round_to is not None:
            score = F.round(score, round_to)
        scored = cand.withColumn("score", score)
    if dedup_candidates:
        # Scores of duplicates are identical (same rounded kernel), so
        # any one row per (query, candidate) is the right survivor.
        scored = scored.dropDuplicates([query_id, corpus_id])
    return (scored
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(query_id, corpus_id, "score", "rank"))


def _probe_rows_driver(queries: DataFrame, centroids: DataFrame,
                       nprobe: int, query_id: str, query_vec: str,
                       cluster_col: str,
                       round_to: int | None) -> list[dict]:
    """Driver-side cosine probe ranking — same convention as
    probe_clusters and every BLAS kernel in this repo: round-to-6
    scores ranked with a stable (score desc, cluster asc) order via
    stable argsort over id-sorted centroids, computed as one numpy
    matmul instead of a crossJoin + window Spark job.  Both inputs
    are small by contract (guarded).  (As with the other kernels,
    numpy and JVM summation/rounding agree at 6 decimals in practice;
    a value landing exactly on a rounding boundary is the shared
    theoretical caveat, not specific to this path.)"""
    import numpy as np

    from python_vector_db___ai_spark.operators._guards import collect_small

    qrows = collect_small(
        queries.select(query_id, query_vec), "ivf_search queries",
        hint="Query batches are small by contract; batch the queries "
             "or use impl='expr' for a fully distributed plan.")
    crows = sorted(collect_small(
        centroids, "ivf_search centroids",
        hint="nlist must stay driver-small."), key=lambda r: r[cluster_col])
    if not qrows or not crows:
        return []
    labs = [r[cluster_col] for r in crows]
    C = np.array([r["centroid"] for r in crows], dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    Q = np.array([r[query_vec] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        S = (Q @ C.T) / np.outer(qn, cn)
    S[(np.outer(qn <= 1e-12, np.ones(len(C), bool)))
      | (np.outer(np.ones(len(Q), bool), cn <= 1e-12))] = 0.0
    if round_to is not None:
        S = np.round(S, round_to)
    order = np.argsort(-S, axis=1, kind="stable")[:, :nprobe]
    return [
        {query_id: qrows[qi][query_id], query_vec: qrows[qi][query_vec],
         cluster_col: labs[ci]}
        for qi in range(len(qrows)) for ci in order[qi]
    ]


def _pruned_matmul_topk(probes, corpus: DataFrame, k: int,
                        metric: str, query_id: str, query_vec: str,
                        corpus_id: str, corpus_vec: str, cluster_col: str,
                        round_to: int, desc: bool) -> DataFrame:
    """The scale-shaped IVF kernel: never materializes (query, candidate)
    pair rows.  The probe table (n_queries x nprobe — tiny; a DataFrame
    to collect or pre-collected rows from :func:`_probe_rows_driver`)
    is broadcast; the corpus scan is filtered to the union of probed
    clusters (partition pruning on a cluster-partitioned table); each
    Arrow batch groups rows by cluster and runs one BLAS matmul against
    just that cluster's probing queries, emitting local top-k per query.
    Arrow transfer = pruned corpus rows, once.
    """
    import numpy as np
    import pandas as pd

    if metric not in ("cosine", "l2", "inner_product", "neg_inner_product",
                      "euclidean_similarity"):
        raise ValueError(f"metric {metric!r} not supported by the pruned "
                         "BLAS kernel")

    from python_vector_db___ai_spark.operators._guards import collect_small

    if isinstance(probes, DataFrame):
        probe_rows = collect_small(
            probes, "ivf_search probe table",
            hint="nprobe x n_queries must stay driver-small; batch the "
                 "queries or use impl='expr' for a fully distributed plan.")
    else:
        probe_rows = probes
    by_label: dict = {}
    for r in probe_rows:
        by_label.setdefault(r[cluster_col], []).append(
            (r[query_id], np.array(r[query_vec], dtype=np.float64)))
    qmap = {
        lab: (np.array([q for q, _ in rows], dtype=np.int64),
              np.stack([v for _, v in rows]))
        for lab, rows in by_label.items()
    }
    labels = sorted(by_label)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(qmap)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for lab, sub in pdf.groupby(cluster_col, sort=False):
                entry = bc.value.get(lab)
                if entry is None:
                    continue
                q_ids, Q = entry
                C = np.array(sub[corpus_vec].tolist(), dtype=np.float64)
                c_ids = sub[corpus_id].to_numpy(dtype=np.int64)
                if metric == "cosine":
                    qn = np.linalg.norm(Q, axis=1)
                    cn = np.linalg.norm(C, axis=1)
                    denom = np.outer(qn, cn)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        S = (Q @ C.T) / denom
                    S[(np.outer(qn <= 1e-12, np.ones(len(C), bool)))
                      | (np.outer(np.ones(len(Q), bool), cn <= 1e-12))] = 0.0
                elif metric in ("l2", "euclidean_similarity"):
                    sq = (np.sum(Q * Q, axis=1)[:, None]
                          + np.sum(C * C, axis=1)[None, :] - 2.0 * (Q @ C.T))
                    S = np.sqrt(np.clip(sq, 0.0, None))
                    if metric == "euclidean_similarity":
                        S = 1.0 / (1.0 + S)
                elif metric == "neg_inner_product":
                    S = -(Q @ C.T)
                else:           # inner_product (validated above)
                    S = Q @ C.T
                S = np.round(S, round_to)
                kk = min(k, len(c_ids))
                for qi in range(len(q_ids)):
                    keys = -S[qi] if desc else S[qi]
                    order = np.lexsort((c_ids, keys))[:kk]
                    out.append(pd.DataFrame({
                        query_id: np.full(len(order), q_ids[qi]),
                        corpus_id: c_ids[order],
                        "score": S[qi][order]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    pruned = (corpus.filter(F.col(cluster_col).isin(labels))
              .select(cluster_col, corpus_id, corpus_vec))
    return pruned.mapInPandas(
        kernel, schema=f"{query_id} long, {corpus_id} long, score double")


def _score_pairs_blas(pairs: DataFrame, k: int, metric: str, query_id: str,
                      query_vec: str, corpus_id: str, corpus_vec: str,
                      round_to: int, desc: bool) -> DataFrame:
    """Vectorized (query, candidate) pair scoring + per-batch local
    top-k — the Arrow-side half of the pruned IVF scan."""
    import numpy as np

    if metric not in ("cosine", "l2", "inner_product", "neg_inner_product",
                      "euclidean_similarity"):
        raise ValueError(f"metric {metric!r} not supported by the BLAS path")

    def op(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.array(pdf[query_vec].tolist(), dtype=np.float64)
            C = np.array(pdf[corpus_vec].tolist(), dtype=np.float64)
            dot = np.einsum("ij,ij->i", Q, C)
            if metric == "cosine":
                qn = np.linalg.norm(Q, axis=1)
                cn = np.linalg.norm(C, axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = dot / (qn * cn)
                s[(qn <= 1e-12) | (cn <= 1e-12)] = 0.0
            elif metric in ("l2", "euclidean_similarity"):
                s = np.sqrt(np.clip(
                    np.einsum("ij,ij->i", Q, Q)
                    + np.einsum("ij,ij->i", C, C) - 2.0 * dot, 0.0, None))
                if metric == "euclidean_similarity":
                    s = 1.0 / (1.0 + s)
            elif metric == "neg_inner_product":
                s = -dot
            else:
                s = dot
            out = pdf[[query_id, corpus_id]].copy()
            out["score"] = np.round(s, round_to)
            out = out.sort_values(
                [query_id, "score", corpus_id],
                ascending=[True, not desc, True])
            yield out.groupby(query_id, sort=False).head(k)

    return pairs.mapInPandas(
        op, schema=f"{query_id} long, {corpus_id} long, score double")


def recall_against_exact(approx: DataFrame, exact: DataFrame,
                         query_id: str = "query_id",
                         corpus_id: str = "id") -> DataFrame:
    """Recall@k of an approximate result vs the exact scan (X6) —
    ``|approx ∩ exact| / |exact|`` per query via a semi-join (J2)."""
    hits = (approx.select(query_id, corpus_id)
            .join(exact.select(query_id, corpus_id), [query_id, corpus_id],
                  "left_semi")
            .groupBy(query_id).agg(F.count("*").cast("long").alias("n_hits")))
    totals = (exact.groupBy(query_id)
              .agg(F.count("*").cast("long").alias("n_exact")))
    return (totals.join(hits, query_id, "left")
            .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
            .select(query_id, "n_exact", "n_hits",
                    F.round(F.col("n_hits") / F.col("n_exact"), 6)
                    .alias("recall")))


def kmeans_centroids(corpus: DataFrame, nlist: int = 10, seed: int = 42,
                     vec_col: str = "embedding",
                     cluster_col: str = "cluster_id",
                     max_iter: int = 8) -> DataFrame:
    """Train the MLlib-KMeans coarse quantizer and return its centroids
    as a ``(cluster_col, centroid array<double>)`` frame — the same
    shape :func:`build_centroids` produces, so :func:`probe_clusters` /
    :func:`ivf_search` work with either quantizer.

    ``max_iter=8``: a coarse quantizer needs rough Voronoi structure,
    not convergence — measured recall is identical to maxIter=20 on
    the test corpora at a third of the fit cost.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter,
                   featuresCol="_features", predictionCol="_p").fit(feats)
    rows = [(int(i), [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())]
    # VALUES-inlined LocalRelation: the fitted centroids are
    # deterministic (fixed seed over the same input), so the inlined
    # rows canonicalize stably across rebuilds and downstream cached
    # frames (assignments, search results) stay matchable — an
    # RDD-backed literal here invalidated every dependent cache on
    # each rebuild (see functions/inline.py).
    return inline_table(corpus.sparkSession, rows,
                        f"{cluster_col} int, centroid array<double>")


def assign_clusters(corpus: DataFrame, centroids: DataFrame,
                    spill: int = 1, metric: str = "cosine",
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    cluster_col: str = "cluster_id",
                    round_to: int | None = 6,
                    impl: str = "blas") -> DataFrame:
    """Assign each corpus vector to its ``spill`` nearest centroids —
    IVF list assignment with replication.  ``spill > 1`` is the
    standard boundary-pair recall fix: storage grows ``spill``×, and
    queries keep finding near neighbors that straddle a cluster edge.
    Returns ``(id_col, vec_col, cluster_col)`` with ``spill`` rows per
    vector; write it partitioned by ``cluster_col`` for pruning.

    ``impl="blas"`` (default) scores each Arrow batch against the
    broadcast centroid matrix in one matmul — the corpus-sized pass
    must not go through interpreted per-row lambda expressions.
    ``impl="expr"`` keeps the pure-Column path (used where the DuckDB
    oracle replays the assignment).
    """
    if impl == "expr":
        return probe_clusters(
            corpus.select(F.col(id_col), F.col(vec_col)),
            centroids, nprobe=spill, metric=metric, query_id=id_col,
            query_vec=vec_col, cluster_col=cluster_col, round_to=round_to)

    import numpy as np
    import pandas as pd

    if metric != "cosine":
        raise ValueError("blas assignment currently implements cosine only")
    from python_vector_db___ai_spark.operators._guards import collect_small

    crows = sorted(collect_small(
        centroids, "assign_clusters centroids",
        hint="nlist must stay driver-small; a quantizer this large "
             "should be an IVF-of-IVF (coarse quantize the centroids)."),
        key=lambda r: r[cluster_col])
    cids = np.array([r[cluster_col] for r in crows], dtype=np.int32)
    C = np.array([r["centroid"] for r in crows], dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((cids, C, cn))

    def op(batches):
        cids_, C_, cn_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vn = np.linalg.norm(V, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                S = (V @ C_.T) / np.outer(vn, cn_)
            S[(np.outer(vn <= 1e-12, np.ones(len(C_), bool)))
              | (np.outer(np.ones(len(V), bool), cn_ <= 1e-12))] = 0.0
            if round_to is not None:
                S = np.round(S, round_to)
            # stable argsort on -S: ties resolve to the lower cluster id
            # because C_ rows are sorted by id — same tie-break as the
            # expression path's (score desc, cluster asc) window.
            order = np.argsort(-S, axis=1, kind="stable")[:, :spill]
            m = order.shape[1]
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), m),
                vec_col: [v for v in pdf[vec_col] for _ in range(m)],
                cluster_col: cids_[order].ravel()})

    return corpus.select(id_col, vec_col).mapInPandas(
        op, schema=f"{id_col} long, {vec_col} array<double>, "
                   f"{cluster_col} int")


def kmeans_assign(corpus: DataFrame, nlist: int = 10, seed: int = 42,
                  vec_col: str = "embedding",
                  out_col: str = "cluster_id") -> DataFrame:
    """MLlib KMeans cluster assignment (the FAISS IVF quantizer analog,
    day_6/day6_complete.py:105-115; k choice mirrors
    ``nlist=min(100, n/10)``).  Adds ``out_col`` to the corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.withColumn("_features",
                              array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=nlist, seed=seed, featuresCol="_features",
                   predictionCol=out_col).fit(feats)
    return model.transform(feats).drop("_features") \
        .withColumn(out_col, F.col(out_col).cast("int"))


def kmeans_silhouette_sweep(corpus: DataFrame, k_values=range(2, 8),
                            seed: int = 42,
                            vec_col: str = "embedding") -> DataFrame:
    """X7: KMeans k sweep scored by silhouette
    (day_5/day5_complete.py:165-207 KMeans + silhouette_score).

    The sweep is MLlib-internal (no SQL oracle), so the result carries
    its own invariants as checked columns: ``silhouette_in_range``
    (silhouette ∈ [-1, 1] by definition) and ``inertia_non_increasing``
    (more clusters should lower the fitted within-cluster SSE; a 5%
    tolerance absorbs k-means++ local optima — independent inits per k
    give no strict ordering guarantee, so this is a seeded-sweep
    diagnostic, not a mathematical invariant).  Both hold uniformly on
    the shipped data — pytest asserts them, and any downstream reader
    can re-assert without re-fitting.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator
    from pyspark.ml.functions import array_to_vector

    feats = corpus.withColumn("_features",
                              array_to_vector(F.col(vec_col).cast("array<double>"))) \
                  .cache()
    rows = []
    evaluator = ClusteringEvaluator(featuresCol="_features",
                                    predictionCol="_p", metricName="silhouette")
    prev_inertia = None
    for k in k_values:
        model = KMeans(k=k, seed=seed, featuresCol="_features",
                       predictionCol="_p").fit(feats)
        pred = model.transform(feats)
        sil = float(evaluator.evaluate(pred))
        inertia = float(model.summary.trainingCost)
        rows.append((int(k), sil, inertia,
                     -1.0 <= sil <= 1.0,
                     prev_inertia is None or inertia <= prev_inertia * 1.05))
        prev_inertia = inertia
    feats.unpersist()
    spark = corpus.sparkSession
    return spark.createDataFrame(
        rows, "k int, silhouette double, inertia double, "
              "silhouette_in_range boolean, inertia_non_increasing boolean")
