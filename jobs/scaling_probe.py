"""Scaling probe: time the extraction map over a pre-generated transcripts
table at the parallelism of the submitting master; print one JSON line.

Used by tools/bench_scaling.py at two parallelism levels (N and 4N cores)
on the SAME input to evidence the north rule's scaling-efficiency
criterion in a single-machine sandbox.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from marie_ai_spark.operators.extract import extract_transcripts

    spark = SparkSession.builder.appName("scaling-probe").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cores = spark.sparkContext.defaultParallelism

    df = spark.read.parquet(args.input)
    rows = df.count()  # also warms the OS page cache for the timed scans
    src = df

    def cpu_snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))

    best = None
    best_steal = 0.0
    for _ in range(args.runs):
        s0 = cpu_snap()
        t0 = time.perf_counter()
        extract_transcripts(src).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        s1 = cpu_snap()
        d = [y - z for z, y in zip(s0, s1)]
        steal = round(100 * d[7] / (sum(d) or 1), 2)
        if best is None or dt < best:
            best, best_steal = dt, steal

    json.dump(
        {
            "cores": cores,
            "rows": rows,
            "elapsed_sec": round(best, 3),
            "turns_per_sec": round(rows / best, 1),
            # steal% observed over the best run's window: cross-cycle
            # medians are filtered on this (shared-host weather)
            "steal_pct": best_steal,
        },
        sys.stdout,
    )
    print()
    spark.stop()


if __name__ == "__main__":
    main()
