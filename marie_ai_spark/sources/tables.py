"""Table IO abstraction: one seam for parquet-directory tables today and
an Iceberg catalog on a real cluster.

The engine's durability semantics (lineage claim/complete, dynamic
partition overwrite, appends) are expressed against this module so the
storage backend is swappable:

  - parquet backend (sandbox default): directory-per-table,
    partitionOverwriteMode=dynamic emulates partition-level MERGE
  - iceberg backend: same calls route to `writeTo(...)` /
    `MERGE INTO` when `spark.sql.catalog.<name>` is configured with the
    iceberg-spark-runtime jar (not bundled in this sandbox — the backend
    raises a clear error if selected without the catalog present)

The reference's durable state lives in PostgreSQL tables with lease CAS
(marie/scheduler/fixtures.py:37-145); both backends here preserve the
properties that matter: atomic per-partition replace and append-only
metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, backend: str = "parquet",
                 catalog: str = "local"):
        self.spark = spark
        self.backend = backend
        self.catalog = catalog
        if backend == "iceberg":
            conf = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
            if not conf:
                raise RuntimeError(
                    f"iceberg backend selected but spark.sql.catalog.{catalog} "
                    "is not configured (iceberg-spark-runtime jar + catalog "
                    "conf required)"
                )

    # -- reads ---------------------------------------------------------
    def read(self, table: str) -> DataFrame:
        if self.backend == "iceberg":
            return self.spark.read.table(f"{self.catalog}.{table}")
        return self.spark.read.parquet(table)

    def exists(self, table: str) -> bool:
        if self.backend == "iceberg":
            return self.spark.catalog.tableExists(f"{self.catalog}.{table}")
        import os

        return os.path.exists(table)

    # -- writes --------------------------------------------------------
    def append(self, df: DataFrame, table: str) -> None:
        if self.backend == "iceberg":
            df.writeTo(f"{self.catalog}.{table}").append()
        else:
            df.write.mode("append").parquet(table)

    def overwrite_partitions(self, df: DataFrame, table: str,
                             partition_col: str) -> None:
        """Replace only the partitions present in df (idempotent re-runs)."""
        if self.backend == "iceberg":
            df.writeTo(f"{self.catalog}.{table}").overwritePartitions()
        else:
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(table)
            )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist a table bucketed+sorted on the join key: two tables bucketed
    the same way join with ZERO exchange (co-located shuffle-free join —
    the pre-shuffle you pay once at write time instead of per query; the
    100 TB pattern for repeatedly-joined fact/dim tables). Verified by a
    plan assertion in tests/test_bucketed_join.py."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
