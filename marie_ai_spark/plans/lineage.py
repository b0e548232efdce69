"""Per-partition lineage/metrics table: the engine's checkpoint + resume
state.

Spark analog of the reference scheduler's `job` + `job_history` tables
(PostgreSQL DDL at marie/scheduler/fixtures.py:37-145: state enum, retry
columns, lease CAS, history trigger). Here, work is partitioned into
deterministic conv_id hash buckets; each completed bucket appends one row:

    lineage(run_id, partition_id, status, rows_in, rows_out, checksum,
            started_at, completed_at, attempt)

Resume = anti-join of the bucket list against `status='done'` rows — the
content-addressed "skip if output exists" memoization of the reference
(marie/pipe/components.py:619-625) lifted to partition granularity.

Storage is parquet-append under a directory (Iceberg MERGE INTO would claim
buckets atomically on a real cluster; the IO layer is isolated here so the
parquet fallback and an Iceberg catalog are interchangeable).

Checksum is order-independent (`sum(xxhash64(conv_id, turn_idx))` per
bucket) so it is stable under any task/partition order at any scale.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import local_df_1p

LINEAGE_SCHEMA = (
    "run_id string, partition_id int, status string, rows_in long, "
    "rows_out long, checksum string, started_at timestamp, "
    "completed_at timestamp, attempt int"
)


def bucket_col(n_buckets: int):
    """Deterministic work-bucket id for a row: hash(conv_id) mod n."""
    return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ) or os.path.isdir(os.path.join(path, "_delta_log")):
        return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
    if os.path.isdir(path):
        try:
            return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
        except Exception:
            pass
    return spark.createDataFrame([], LINEAGE_SCHEMA)


def done_partitions(spark: SparkSession, path: str, run_id: str) -> set[int]:
    lin = read_lineage(spark, path)
    rows = (
        lin.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r.partition_id for r in rows}


def append_lineage(spark: SparkSession, path: str, rows: list[dict]) -> None:
    """Append lineage rows so that CONCURRENT writers never collide.

    A plain `.mode("append")` stages every job under the SAME
    `<path>/_temporary/0` dir (FileOutputCommitter), so the first job to
    commit deletes a concurrent job's staged files — the reason the seam
    historically disclaimed multi-writer use. Instead each append writes
    to a private `<path>__stage_<uuid>` dir and renames its part files
    into the table under uuid-unique names (one atomic rename per file on
    any Hadoop FS). Disjoint-bucket jobs can therefore append lineage
    concurrently; proven by tests/test_resume.py's concurrent-writer
    test."""
    if not rows:
        return
    df = local_df_1p(
        spark,
        [
            (
                r["run_id"],
                r["partition_id"],
                r["status"],
                r["rows_in"],
                r["rows_out"],
                r["checksum"],
                r["started_at"],
                r["completed_at"],
                r["attempt"],
            )
            for r in rows
        ],
        LINEAGE_SCHEMA,
    )
    tag = uuid.uuid4().hex
    stage = f"{path}__stage_{tag}"
    df.write.mode("overwrite").parquet(stage)
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(Path(path))
    i = 0
    for st in fs.listStatus(Path(stage)):
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        dest = Path(f"{path}/part-{tag}-{i}.parquet")
        # Hadoop FileSystem.rename reports most failures by returning
        # false, not throwing — an unchecked false here would silently
        # drop the bucket's lineage rows and resume would reprocess it.
        if not fs.rename(st.getPath(), dest):
            fs.delete(Path(stage), True)
            raise IOError(
                f"append_lineage: rename {st.getPath()} -> {dest} failed"
            )
        i += 1
    fs.delete(Path(stage), True)


def partition_metrics(extracted_with_bucket: DataFrame) -> DataFrame:
    """Per-bucket rows_out + order-independent checksum, one narrow agg."""
    # decimal(38,0) accumulator: order-independent and overflow-free under
    # ANSI mode even at 10^12 rows per bucket
    return extracted_with_bucket.groupBy("_bucket").agg(
        F.count(F.lit(1)).alias("rows_out"),
        F.sum(F.xxhash64("conv_id", "turn_idx").cast("decimal(38,0)"))
        .cast("string")
        .alias("checksum"),
    )


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def run_report(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-run lineage rollup: buckets done/failed, rows, attempts, wall
    span — the observability surface of the job table
    (analog of the reference's job_history audit)."""
    lin = read_lineage(spark, f"{out_dir}/lineage")
    return (
        lin.groupBy("run_id")
        .agg(
            F.sum(F.when(F.col("status") == "done", 1).otherwise(0)).alias(
                "buckets_done"
            ),
            F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias(
                "buckets_failed"
            ),
            F.sum(F.when(F.col("status") == "done", F.col("rows_out"))).alias(
                "rows_out"
            ),
            F.max("attempt").alias("max_attempt"),
            F.min("started_at").alias("first_started"),
            F.max("completed_at").alias("last_completed"),
        )
    )
