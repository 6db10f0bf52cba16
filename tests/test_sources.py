"""Reader/writer round-trip tests (S1-S8, S13, S14, X8)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from python_vector_db___ai_spark.sources.readers import (
    fetch_urls,
    load_embeddings,
    read_documents_dir,
    read_wide_vector_csv,
)
from python_vector_db___ai_spark.sources.writers import (
    append_query_log,
    estimate_index_memory_bytes,
    export_embeddings,
)


def test_wide_vector_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "vec.csv"
    p.write_text(
        "vector_id,category,dim_0,dim_1,dim_2\n"
        "v1,A,1.0,2.0,3.0\n"
        "v2,B,4.0,,6.0\n"          # null component -> dropped (P2)
        "v3,A,7.0,8.0,9.0\n")
    df = read_wide_vector_csv(spark, str(p))
    rows = {r.vector_id: r.vector for r in df.collect()}
    assert set(rows) == {"v1", "v3"}
    assert rows["v1"] == [1.0, 2.0, 3.0]


def test_documents_dir_wholetext(spark, tmp_path):
    sub = tmp_path / "docs" / "nested"
    sub.mkdir(parents=True)
    (tmp_path / "docs" / "a.txt").write_text("alpha doc\nwith two lines")
    (sub / "b.txt").write_text("beta doc")
    (sub / "c.md").write_text("ignored")
    df = read_documents_dir(spark, str(tmp_path / "docs"))
    got = {os.path.basename(r.path): r.text for r in df.collect()}
    assert got == {"a.txt": "alpha doc\nwith two lines", "b.txt": "beta doc"}


def test_export_import_embeddings(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])], ["vec_id", "embedding"])
    pq = str(tmp_path / "emb_parquet")
    export_embeddings(df, pq, "parquet")
    back = load_embeddings(spark, pq, "parquet")
    assert back.count() == 2

    cv = str(tmp_path / "emb_csv")
    export_embeddings(df, cv, "csv")
    back_csv = load_embeddings(spark, cv, "csv")
    rows = {r.vec_id: r.embedding for r in back_csv.collect()}
    assert rows[1] == pytest.approx([0.1, 0.2])


def test_append_query_log(spark, tmp_path):
    log = str(tmp_path / "qlog")
    df = spark.createDataFrame([("q1", "hello")], ["query_id", "answer"])
    append_query_log(df, log)
    append_query_log(df, log)
    back = spark.read.parquet(log)
    assert back.count() == 2
    assert "logged_at" in back.columns


def test_fetch_urls_with_fake_fetcher(spark):
    urls = [f"http://x/{i}" for i in range(5)]
    out = fetch_urls(spark, urls, fetch_fn=lambda u: f"body-of-{u[-1]}")
    got = {r.url: r.body for r in out.collect()}
    assert got["http://x/3"] == "body-of-3"
    assert len(got) == 5


def test_memory_estimation():
    # X8 formula: flat = n*dim*4; hnsw adds n*32*4
    assert estimate_index_memory_bytes(50000, 384, "flat") == 50000 * 384 * 4
    assert (estimate_index_memory_bytes(50000, 384, "hnsw")
            == 50000 * 384 * 4 + 50000 * 32 * 4)


def test_events_ts_survives_both_parquet_flavors(spark, tmp_path):
    """Regression: the driver's testdata has flipped events.ts between
    TIMESTAMP(NANOS) and timestamp[us] across rounds.  load_table must
    return the identical microsecond TIMESTAMP column for both."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from python_vector_db___ai_spark.session import load_table

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_699_999_999_000_001]
    ids = list(range(len(micros)))

    def write(flavor: str, arr: pa.Array) -> str:
        d = tmp_path / flavor
        d.mkdir()
        tbl = pa.table({"event_id": pa.array(ids, pa.int64()), "ts": arr})
        papq.write_table(tbl, str(d / "events.parquet"), version="2.6")
        return str(d)

    d_us = write("us", pa.array(micros, pa.timestamp("us")))
    d_ns = write("ns", pa.array([m * 1000 for m in micros], pa.timestamp("ns")))

    got = {}
    for flavor, d in (("us", d_us), ("ns", d_ns)):
        df = load_table(spark, d, "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp", flavor
        got[flavor] = {
            r.event_id: r.us
            for r in df.select("event_id", F.unix_micros("ts").alias("us")).collect()
        }
    assert got["us"] == got["ns"] == dict(zip(ids, micros))


def test_driver_table_schema_canary(spark):
    """Round-4 was lost to a silent testdata dtype flip (events.ts).
    This canary pins what the engine RELIES on — required columns per
    table, and the tolerated type families for the sensitive columns —
    so the next generator drift fails here with a pointed message, not
    deep inside a query plan."""
    from pyspark.sql import types as T

    from python_vector_db___ai_spark.session import TABLES, load_table
    from tests.conftest import SF_DIR

    required = {
        "region": {"r_regionkey", "r_name"},
        "nation": {"n_nationkey", "n_name", "n_regionkey"},
        "customer": {"c_custkey", "c_nationkey", "c_acctbal",
                     "c_mktsegment"},
        "supplier": {"s_suppkey", "s_nationkey", "s_acctbal"},
        "part": {"p_partkey", "p_brand", "p_type", "p_size",
                 "p_retailprice"},
        "orders": {"o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"},
        "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate"},
        "events": {"event_id", "ts", "user_id", "event_type", "value",
                   "props"},
        "documents": {"doc_id", "text", "lang", "source"},
        "embeddings": {"vec_id", "embedding", "label"},
    }
    loaded = {t: load_table(spark, SF_DIR, t) for t in TABLES}
    for t, cols in required.items():
        missing = cols - set(loaded[t].columns)
        assert not missing, (
            f"driver table {t!r} lost required columns {sorted(missing)} — "
            "testdata schema drifted; audit every query touching it")

    # events.ts: whatever parquet flavor the generator wrote, load_table
    # must normalize to a session-TZ TIMESTAMP (the round-4 regression)
    ts_t = loaded["events"].schema["ts"].dataType
    assert isinstance(ts_t, T.TimestampType), (
        f"load_table must normalize events.ts to TIMESTAMP, got {ts_t} — "
        "extend session.normalize_events_ts for the new flavor")

    # embedding element type: the numpy kernels accept float or double
    emb_t = loaded["embeddings"].schema["embedding"].dataType
    assert isinstance(emb_t, T.ArrayType) and isinstance(
        emb_t.elementType, (T.FloatType, T.DoubleType)), (
        f"embeddings.embedding drifted to {emb_t}")

    # event-time columns the TPC-H queries aggregate on: timestamp-like
    for tbl, col in (("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        dt = loaded[tbl].schema[col].dataType
        assert isinstance(dt, (T.TimestampType, T.TimestampNTZType,
                               T.DateType)), (
            f"{tbl}.{col} drifted to {dt} — check the tpch oracles")
