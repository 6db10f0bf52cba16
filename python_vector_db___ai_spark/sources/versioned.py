"""Versioned table on plain parquet — the Delta-lite CRUD story.

The reference mutates state in place (Chroma collections, pgvector
rows); Spark-native storage is immutable files.  Real deployments use
Delta/Iceberg for ACID MERGE/DELETE + time travel; this container has
neither, so ``VersionedTable`` provides the same call-site semantics on
plain parquet:

* every mutation writes a **new version partition** (``_version=N``) —
  append-only storage, atomic per version;
* reads pin a version (default: latest) and prune to that partition at
  the scan (one-partition read, verified in tests);
* ``upsert`` / ``delete`` compose the operators from ``operators.crud``
  against the latest snapshot and write the result as N+1 — exactly a
  MERGE/DELETE commit;
* ``history()`` lists versions with row counts (DESCRIBE HISTORY).

At 100 TB you would swap this for Delta and keep the API; full-snapshot
versions would become copy-on-write of touched files only.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VCOL = "_version"


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- inspection ----------------------------------------------------
    def versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            m = re.fullmatch(rf"{_VCOL}=(\d+)", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def history(self) -> DataFrame:
        rows = []
        for v in self.versions():
            rows.append((v, self.read(v).count()))
        return self.spark.createDataFrame(
            rows or [(None, None)], "version long, n_rows long").dropna()

    # -- reads ---------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        if version is None:
            version = self.latest_version()
        if version is None:
            raise FileNotFoundError(f"no versions at {self.path}")
        # partition filter -> the scan touches exactly one version dir
        return (self.spark.read.parquet(self.path)
                .filter(F.col(_VCOL) == version)
                .drop(_VCOL))

    # -- writes --------------------------------------------------------
    def _write(self, df: DataFrame, version: int) -> int:
        (df.withColumn(_VCOL, F.lit(version))
           .write.partitionBy(_VCOL).mode("append").parquet(self.path))
        return version

    def create(self, df: DataFrame) -> int:
        if self.versions():
            raise FileExistsError(f"{self.path} already has versions")
        return self._write(df, 0)

    def upsert(self, updates: DataFrame, key: str = "doc_id") -> int:
        from python_vector_db___ai_spark.operators.crud import upsert

        merged = upsert(self.read(), updates, key=key)
        return self._write(merged, self.latest_version() + 1)

    def delete(self, ids, key: str = "doc_id") -> int:
        from python_vector_db___ai_spark.operators.crud import delete_ids

        remaining = delete_ids(self.read(), ids, key=key)
        return self._write(remaining, self.latest_version() + 1)
