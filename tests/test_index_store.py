"""Persisted-index lifecycle: build -> save -> load -> search must
equal the in-flight path (the artifact stores the SAME graph), and the
dense halves (hyperplanes, codebooks) must round-trip bit-exactly."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.operators.hnsw import hnsw_knn
from python_vector_db___ai_spark.operators.index_store import (
    hnsw_build_index,
    hnsw_load,
    hnsw_save,
    hnsw_search,
    load_matrix,
    load_pq_model,
    save_matrix,
    save_pq_model,
)
from python_vector_db___ai_spark.session import load_table
from tests.conftest import SF_DIR

N_PART = 4


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return (emb.filter(F.col("vec_id") < 5)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))


@pytest.fixture(scope="module")
def tmpdir_mod():
    d = tempfile.mkdtemp(prefix="index_store_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_persisted_search_equals_inflight(spark, emb, queries, tmpdir_mod):
    """save -> load -> search reproduces hnsw_knn row-for-row: the
    artifact is the graph, not an approximation of it."""
    idx = hnsw_build_index(emb, n_partitions=N_PART)
    hnsw_save(idx, f"{tmpdir_mod}/hnsw")
    loaded = hnsw_load(spark, f"{tmpdir_mod}/hnsw")
    got = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in hnsw_search(queries, loaded, k=5).collect())
    want = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in hnsw_knn(queries, emb, k=5, n_partitions=N_PART).collect())
    assert got == want
    assert len(got) == 25


def test_index_rows_cover_corpus(spark, emb, tmpdir_mod):
    loaded = hnsw_load(spark, f"{tmpdir_mod}/hnsw")
    n = emb.count()
    assert loaded.count() == n
    assert loaded.select("vec_id").distinct().count() == n
    # every partition agrees on one entry point / top level
    meta = (loaded.groupBy("part_id")
            .agg(F.countDistinct("entry_seq").alias("e"),
                 F.countDistinct("top_level").alias("t")).collect())
    assert all(r.e == 1 and r.t == 1 for r in meta)


def test_connectivity_audit_and_exhaustive_search(spark, emb, queries,
                                                  tmpdir_mod):
    """hnsw_connectivity reports every layer-0 graph fully reachable
    on the sf-fixture corpus, and under that precondition the saved
    artifact searched with an exhaustive beam (ef = corpus size) is
    ROW-IDENTICAL to the exact BLAS scan — the invariant
    hnsw_index_lifecycle's oracle branch rests on."""
    from python_vector_db___ai_spark.operators.index_store import (
        hnsw_connectivity,
    )
    from python_vector_db___ai_spark.operators.search import knn_join_blas

    loaded = hnsw_load(spark, f"{tmpdir_mod}/hnsw")
    audit = hnsw_connectivity(loaded).collect()
    assert len(audit) == N_PART
    assert sum(r.n_nodes for r in audit) == emb.count()
    assert all(r.n_reachable == r.n_nodes for r in audit), audit
    n = emb.count()
    got = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in hnsw_search(queries, loaded, k=5,
                             ef_search=n).collect())
    want = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in knn_join_blas(queries, emb, k=5, metric="cosine",
                               corpus_id="vec_id").collect())
    assert got == want


def test_connectivity_audit_flags_disconnected_graph(spark):
    """A hand-built artifact with an unreachable node must be reported
    (n_reachable < n_nodes) — the audit exists so lost connectivity
    fails attributably instead of as an oracle hash mismatch."""
    from python_vector_db___ai_spark.operators.index_store import (
        hnsw_connectivity,
    )

    # part 0: 3 nodes, node 2 has no in-edges from {0,1}; part 1: a
    # connected pair.  Schema mirrors _INDEX_SCHEMA.
    rows = [
        (0, 0, 10, [1.0, 0.0], 0, 0, 0, [[1]]),
        (0, 1, 11, [0.0, 1.0], 0, 0, 0, [[0]]),
        (0, 2, 12, [0.5, 0.5], 0, 0, 0, [[0, 1]]),
        (1, 0, 20, [1.0, 0.0], 0, 0, 0, [[1]]),
        (1, 1, 21, [0.0, 1.0], 0, 0, 0, [[0]]),
    ]
    idx = spark.createDataFrame(
        rows, "part_id int, seq int, vec_id long, vec array<double>, "
              "level int, entry_seq int, top_level int, "
              "nbrs array<array<int>>")
    audit = {r.part_id: (r.n_nodes, r.n_reachable)
             for r in hnsw_connectivity(idx).collect()}
    assert audit[0] == (3, 2)
    assert audit[1] == (2, 2)


def test_search_is_search_only(spark, queries, tmpdir_mod):
    """The search path must not reference the corpus table at all —
    its only scan is the index artifact."""
    loaded = hnsw_load(spark, f"{tmpdir_mod}/hnsw")
    plan = (hnsw_search(queries, loaded, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "hnsw" in plan  # the artifact path appears in the scan
    assert "embeddings" not in plan


def test_matrix_roundtrip(spark, tmpdir_mod):
    import numpy as np

    rng = np.random.default_rng(7)
    H = rng.standard_normal((12, 16))
    save_matrix(spark, H, f"{tmpdir_mod}/H")
    H2 = load_matrix(spark, f"{tmpdir_mod}/H")
    assert H2.shape == H.shape
    assert (H2 == H).all()  # bit-exact through parquet DOUBLE


def test_pq_model_roundtrip_and_search(spark, emb, queries, tmpdir_mod):
    from python_vector_db___ai_spark.operators.pq import (
        pq_encode,
        pq_search_rerank,
        pq_train,
    )

    model = pq_train(emb, m=8, n_codes=16, iters=4, normalize=True)
    save_pq_model(spark, model, f"{tmpdir_mod}/pq")
    model2 = load_pq_model(spark, f"{tmpdir_mod}/pq")
    assert model2[0] == model[0] and model2[1] == model[1]
    assert (model2[2] == model[2]).all()
    assert model2[3] == model[3]

    enc = pq_encode(emb, model)
    enc.write.mode("overwrite").parquet(f"{tmpdir_mod}/codes")
    enc2 = spark.read.parquet(f"{tmpdir_mod}/codes")
    got = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in pq_search_rerank(queries, emb, enc2, model2, k=5,
                                  overfetch=4).collect())
    want = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in pq_search_rerank(queries, emb, enc, model, k=5,
                                  overfetch=4).collect())
    assert got == want


def test_sketch_artifact_roundtrip(spark, emb, queries, tmpdir_mod):
    from python_vector_db___ai_spark.operators.lsh import (
        sketch_build,
        sketch_knn,
    )

    H, sk = sketch_build(emb, n_bits=64)
    save_matrix(spark, H, f"{tmpdir_mod}/skH")
    sk.write.mode("overwrite").parquet(f"{tmpdir_mod}/sk")
    H2 = load_matrix(spark, f"{tmpdir_mod}/skH")
    sk2 = spark.read.parquet(f"{tmpdir_mod}/sk")
    got = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in sketch_knn(queries, emb, k=5, n_bits=64, L=50,
                            prebuilt=(H2, sk2)).collect())
    want = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in sketch_knn(queries, emb, k=5, n_bits=64, L=50,
                            prebuilt=(H, sk)).collect())
    assert got == want


def test_minhash_index_roundtrip_matches_inflight(spark, tmp_path):
    """The persisted corpus LSH index answers the incremental dedup
    identically to the in-flight build."""
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.operators.dedup import (
        load_minhash_index,
        minhash_build_index,
        minhash_incremental_flags,
        save_minhash_index,
    )
    from python_vector_db___ai_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)

    inflight = minhash_incremental_flags(new, corpus).collect()

    sigs, _ = minhash_build_index(corpus)
    # save derives the banded table from the persisted signatures
    # (one signature pass, nothing cached) and returns the loaded pair
    returned = save_minhash_index(sigs, str(tmp_path / "mh"))
    loaded = load_minhash_index(spark, str(tmp_path / "mh"))
    persisted = minhash_incremental_flags(
        new, corpus, corpus_index=loaded).collect()
    via_returned = minhash_incremental_flags(
        new, corpus, corpus_index=returned).collect()
    assert sorted(map(tuple, persisted)) == sorted(map(tuple, via_returned))

    assert sorted(map(tuple, inflight)) == sorted(map(tuple, persisted))
    assert any(r.is_dup for r in persisted)   # non-degenerate fixture

    # The persisted artifact is NARROW (r11 directive #2): signatures
    # only — the corpus-sized shingle column must NOT reach disk (it
    # was the 2M build's write-variance source); the probe recomputes
    # candidate shingles from the corpus text instead (verified
    # identical above).
    assert set(loaded[0].columns) == {"_id", "sig"}

    # build split (r10 directive #3): the optional stage_timings dict
    # carries the sign+write / reload+band+write phases, part-file
    # counts (a partitionBy small-files explosion must be visible) and
    # on-disk byte sizes (the narrowing claim is auditable)
    st: dict = {}
    save_minhash_index(sigs, str(tmp_path / "mh2"), stage_timings=st)
    assert set(st) == {"sigs_write_sec", "band_write_sec", "reload_sec",
                       "sigs_files", "bands_files",
                       "sigs_bytes", "bands_bytes"}
    assert st["sigs_write_sec"] > 0 and st["band_write_sec"] > 0
    assert st["sigs_files"] >= 1 and st["bands_files"] >= 4
    assert st["sigs_bytes"] > 0 and st["bands_bytes"] > 0


def _artifact_rows(df):
    return sorted(
        (r.part_id, r.seq, r.vec_id,
         tuple(round(x, 12) for x in r.vec), r.level, r.entry_seq,
         r.top_level, tuple(tuple(layer) for layer in r.nbrs))
        for r in df.collect())


def test_upsert_append_equals_fresh_build(spark, emb, tmpdir_mod):
    """The daily-pipeline contract: build on the base corpus, save,
    load, upsert a batch of NEW (higher-id) vectors — the resulting
    artifact must be BIT-IDENTICAL to a fresh build over the full
    corpus (same insertion sequence replayed per partition)."""
    from python_vector_db___ai_spark.operators.index_store import (
        hnsw_upsert,
    )

    split = 40
    base = emb.filter(F.col("vec_id") < split)
    batch = emb.filter(F.col("vec_id") >= split)
    assert base.count() > 0 and batch.count() > 0

    idx = hnsw_build_index(base, n_partitions=N_PART)
    hnsw_save(idx, f"{tmpdir_mod}/hnsw_base")
    loaded = hnsw_load(spark, f"{tmpdir_mod}/hnsw_base")
    upserted = hnsw_upsert(loaded, batch, n_partitions=N_PART)
    fresh = hnsw_build_index(emb, n_partitions=N_PART)
    assert _artifact_rows(upserted) == _artifact_rows(fresh)


def test_upsert_search_equals_fresh_search(spark, emb, queries,
                                           tmpdir_mod):
    """And therefore search over the upserted artifact returns exactly
    the fresh-build search rows at the same recall."""
    from python_vector_db___ai_spark.operators.index_store import (
        hnsw_upsert,
    )

    split = 40
    idx = hnsw_build_index(emb.filter(F.col("vec_id") < split),
                           n_partitions=N_PART)
    hnsw_save(idx, f"{tmpdir_mod}/hnsw_base2")
    loaded = hnsw_load(spark, f"{tmpdir_mod}/hnsw_base2")
    up = hnsw_upsert(loaded, emb.filter(F.col("vec_id") >= split),
                     n_partitions=N_PART)
    hnsw_save(up, f"{tmpdir_mod}/hnsw_v2")
    v2 = hnsw_load(spark, f"{tmpdir_mod}/hnsw_v2")
    got = sorted((r.query_id, r.vec_id, r.score, r.rank)
                 for r in hnsw_search(queries, v2, k=5).collect())
    want = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in hnsw_search(
            queries, hnsw_build_index(emb, n_partitions=N_PART),
            k=5).collect())
    assert got == want


def test_upsert_into_empty_partition_and_interleaved_ids(spark, emb):
    """Robustness: an upsert whose batch lands in partitions the base
    index never populated, and one with interleaved (lower) ids, must
    still produce a searchable graph covering every row."""
    from python_vector_db___ai_spark.operators.index_store import (
        hnsw_upsert,
    )

    base = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 30))
    batch = emb.filter(F.col("vec_id") < 10)   # interleaves below base
    idx = hnsw_build_index(base, n_partitions=N_PART)
    up = hnsw_upsert(idx, batch, n_partitions=N_PART)
    assert up.count() == 30
    assert up.select("vec_id").distinct().count() == 30
    qs = (emb.filter(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("query_vec")))
    hits = hnsw_search(qs, up, k=5)
    assert hits.groupBy("query_id").count().agg(
        F.min("count")).collect()[0][0] == 5


def test_two_sequential_upserts_compose(spark, emb, tmpdir_mod):
    """Daily-append composition: v0 + batchA + batchB (ascending id
    ranges) must equal the fresh build — the upsert path is closed
    under repetition, so the artifact never needs a full rebuild for
    append workloads."""
    from python_vector_db___ai_spark.operators.index_store import (
        hnsw_upsert,
    )

    v0 = hnsw_build_index(emb.filter(F.col("vec_id") < 25),
                          n_partitions=N_PART)
    v1 = hnsw_upsert(
        v0, emb.filter((F.col("vec_id") >= 25) & (F.col("vec_id") < 40)),
        n_partitions=N_PART)
    hnsw_save(v1, f"{tmpdir_mod}/hnsw_seq_v1")
    v1l = hnsw_load(spark, f"{tmpdir_mod}/hnsw_seq_v1")
    v2 = hnsw_upsert(v1l, emb.filter(F.col("vec_id") >= 40),
                     n_partitions=N_PART)
    fresh = hnsw_build_index(emb, n_partitions=N_PART)
    assert _artifact_rows(v2) == _artifact_rows(fresh)


def test_ivf_append_equals_fresh_assignment_and_search(spark, emb,
                                                       queries,
                                                       tmpdir_mod):
    """IVF incremental maintenance: base lists written partitioned,
    increment appended against the frozen quantizer — the on-disk
    table must equal a fresh full-corpus assignment, and search over
    the appended artifact must equal search over the fresh one."""
    from python_vector_db___ai_spark.operators.index_store import (
        ivf_append,
    )
    from python_vector_db___ai_spark.operators.ivf import (
        assign_clusters,
        ivf_search,
        kmeans_centroids,
    )

    split = 40
    base = emb.filter(F.col("vec_id") < split)
    batch = emb.filter(F.col("vec_id") >= split)
    cents = kmeans_centroids(base, nlist=8, seed=42).cache()
    path = f"{tmpdir_mod}/ivf_lists"
    (assign_clusters(base, cents, spill=2)
     .write.mode("overwrite").partitionBy("cluster_id").parquet(path))
    ivf_append(batch, cents, path, spill=2)

    loaded = spark.read.parquet(path)
    fresh = assign_clusters(emb, cents, spill=2)
    got = sorted((r.vec_id, r.cluster_id) for r in loaded.collect())
    want = sorted((r.vec_id, r.cluster_id) for r in fresh.collect())
    assert got == want

    s1 = sorted((r.query_id, r.vec_id, r.rank) for r in ivf_search(
        queries, loaded, centroids=cents, nprobe=3, k=5,
        corpus_id="vec_id", cluster_col="cluster_id",
        dedup_candidates=True).collect())
    s2 = sorted((r.query_id, r.vec_id, r.rank) for r in ivf_search(
        queries, fresh, centroids=cents, nprobe=3, k=5,
        corpus_id="vec_id", cluster_col="cluster_id",
        dedup_candidates=True).collect())
    assert s1 == s2


def test_upsert_replaces_existing_ids(spark, emb):
    """REPLACE semantics (round 7): re-ingesting EXISTING ids with
    corrected vectors must not duplicate nodes.  Partitions owning a
    replaced id rebuild from their merged node set (new vector wins),
    so the artifact is bit-identical to a fresh build over the
    corrected corpus; untouched partitions keep their graphs."""
    from python_vector_db___ai_spark.operators.index_store import (
        hnsw_upsert,
    )

    idx = hnsw_build_index(emb, n_partitions=N_PART)
    batch = (emb.filter(F.col("vec_id") < 10)
             .select("vec_id",
                     F.transform(F.col("embedding"),
                                 lambda x: x + F.lit(0.25))
                     .alias("embedding")))
    assert batch.count() > 0
    up = hnsw_upsert(idx, batch, n_partitions=N_PART)
    n = emb.count()
    assert up.count() == n                                 # no dup nodes
    assert up.select("vec_id").distinct().count() == n
    corrected = (emb.select("vec_id", "embedding")
                 .filter(F.col("vec_id") >= 10).unionByName(batch))
    fresh = hnsw_build_index(corrected, n_partitions=N_PART)
    assert _artifact_rows(up) == _artifact_rows(fresh)

    # search must see the NEW vector: querying with a corrected
    # vector returns its own id at rank 1 with ~unit cosine
    qs = (batch.filter(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("query_vec")))
    top = {r.query_id: (r.vec_id, r.score)
           for r in hnsw_search(qs, up, k=1).collect()}
    for qid, (vid, score) in top.items():
        assert vid == qid and score > 0.999999


def test_tie_dense_truncation_matches_blas(spark):
    """r8 ADVICE (medium): the per-partition k-truncation must rank by
    (ROUNDED score DESC, vec_id ASC), not raw float order.  15 vectors
    whose cosines to the query all round to 1.0 at 6 decimals but whose
    RAW scores increase with vec_id: raw truncation would keep the
    HIGHEST ids, the contract (and knn_join_blas) keeps the LOWEST."""
    from python_vector_db___ai_spark.operators.index_store import (
        hnsw_connectivity,
    )
    from python_vector_db___ai_spark.operators.search import knn_join_blas

    # eps decreasing with id -> raw cosine INCREASING with id; all
    # eps^2/2 perturbations are < 5e-8, so every rounded score is 1.0.
    tied = [(i, [1.0, (15 - i) * 1e-5, 0.0, 0.0]) for i in range(15)]
    far = [(100 + j, [0.0, 0.0, 1.0, j * 0.05]) for j in range(10)]
    corpus = spark.createDataFrame(tied + far,
                                   "vec_id long, embedding array<double>")
    queries = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0])],
                                    "query_id long, query_vec array<double>")
    idx = hnsw_build_index(corpus, n_partitions=1)
    aud = hnsw_connectivity(idx).collect()
    assert all(r.n_reachable == r.n_nodes for r in aud)
    got = [(r.query_id, r.vec_id, r.score, r.rank)
           for r in hnsw_search(queries, idx, k=10, ef_search=64)
           .orderBy("rank").collect()]
    want = [(r.query_id, r.vec_id, r.score, r.rank)
            for r in knn_join_blas(queries, corpus, k=10, metric="cosine",
                                   corpus_id="vec_id")
            .orderBy("rank").collect()]
    assert got == want
    # the tie set is truncated to the LOWEST ids, all at rounded 1.0
    assert [g[1] for g in got] == list(range(10))
    assert all(g[2] == 1.0 for g in got)


def test_incremental_flags_expose_cache_handles(spark):
    """minhash_incremental_flags pins per-call caches (increment
    sigs; cand on the narrow-index path); a long-running ingest loop
    must be able to release them once the result is materialized (r13
    ADVICE).  The handles ride on the returned frame as
    ``_cached_frames`` and unpersist cleanly."""
    from pyspark.sql import functions as F

    from python_vector_db___ai_spark.operators.dedup import (
        minhash_incremental_flags,
    )
    from python_vector_db___ai_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)

    out = minhash_incremental_flags(new, corpus)
    out.count()                                   # materialize
    handles = getattr(out, "_cached_frames", None)
    assert handles, "cache handles missing from returned frame"
    # in-flight path: increment sigs + corpus sigs both cached
    assert len(handles) == 2
    assert any(fr.storageLevel.useMemory for fr in handles)
    for fr in handles:
        fr.unpersist()
    assert all(not fr.storageLevel.useMemory for fr in handles)
