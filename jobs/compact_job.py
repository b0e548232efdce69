"""spark-submit entry point for small-file compaction of an extracted
table (the operational follow-on to resume: crash/retry/merge cycles
accumulate small files per bucket dir; periodic compaction keeps scan
parallelism from decaying into file-open overhead).

Cluster usage (north rule packaging):
    spark-submit --py-files dist/marie_ai_spark.zip jobs/compact_job.py \
        --output s3://bucket/out --target-mb 128

Prints one JSON line: {run_id, buckets_compacted, files_before,
files_after, elapsed_sec}. Data is verified unchanged (per-bucket rows +
order-independent checksums) before the 'compacted' lineage rows are
written; a no-op (healthy layout) exits with buckets_compacted = 0.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True,
                    help="pipeline out_dir (contains extracted/ + lineage/)")
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--min-files", type=int, default=2)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from marie_ai_spark.plans.pipeline import compact_extracted

    spark = SparkSession.builder.appName("marie-compact").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    t0 = time.perf_counter()
    meta = compact_extracted(
        spark,
        args.output,
        target_file_bytes=args.target_mb * 1024 * 1024,
        min_files=args.min_files,
        run_id=args.run_id,
    )
    meta["elapsed_sec"] = round(time.perf_counter() - t0, 3)
    json.dump(meta, sys.stdout)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
