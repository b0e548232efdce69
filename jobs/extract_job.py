"""spark-submit entry point for the extraction pipeline.

Cluster usage (north rule packaging):
    python tools/build_pyfiles.py
    spark-submit --py-files dist/marie_ai_spark.zip jobs/extract_job.py \
        --input s3://bucket/transcripts --output s3://bucket/out \
        --run-id nightly-2026-08-16 --buckets 4096

Local / sandbox usage (also used by the N-vs-4N scaling bench):
    spark-submit --master 'local[8]' --py-files dist/marie_ai_spark.zip \
        jobs/extract_job.py --input /tmp/in --output /tmp/out --gen-convs 20000

With --gen-convs N the job first synthesizes the deterministic transcripts
table (no external data), then extracts. Prints one JSON line of run
metrics on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--gen-convs", type=int, default=0,
                    help="synthesize transcripts into --input first")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from marie_ai_spark.plans.pipeline import run_extract
    from marie_ai_spark.sources.transcripts import write_transcripts

    spark = SparkSession.builder.appName("marie-extract").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    if args.gen_convs:
        import os

        if not os.path.exists(args.input):
            write_transcripts(spark, args.input, args.gen_convs, args.seed)

    t0 = time.perf_counter()
    meta = run_extract(
        spark, args.input, args.output, run_id=args.run_id,
        n_buckets=args.buckets,
    )
    elapsed = time.perf_counter() - t0
    meta["elapsed_sec"] = round(elapsed, 3)
    meta["turns_per_sec"] = (
        round(meta["rows_out"] / elapsed, 1) if elapsed > 0 else None
    )
    json.dump(meta, sys.stdout)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
