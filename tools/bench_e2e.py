"""End-to-end durable-pipeline throughput: the full extraction job —
Arrow-batched extraction, bucketed parquet writes, per-bucket lineage
rows with checksums — over a pre-generated transcripts table, reporting
turns/sec INCLUDING the durable writes (the honest e2e number, vs the
map-only scaling probe). Verifies exact row parity and bucket completion
before reporting. Writes BENCH/e2e_pipeline.json.

Usage: python tools/bench_e2e.py [input_parquet] [n_buckets]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    data = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, ".bench_data", "transcripts_1000000"
    )
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from marie_ai_spark.plans.pipeline import read_extracted, run_extract
    from marie_ai_spark.session import get_spark

    spark = get_spark("bench-e2e")
    turns_in = spark.read.parquet(data).count()  # warms the page cache
    out = tempfile.mkdtemp(prefix="e2e_")
    try:
        t0 = time.perf_counter()
        r = run_extract(spark, data, out, run_id="e2e", n_buckets=n_buckets)
        elapsed = time.perf_counter() - t0
        turns_out = read_extracted(spark, out).count()
        lin = spark.read.parquet(f"{out}/lineage")
        done = lin.filter("status = 'done'").count()
        failed = lin.filter("status = 'failed'").count()
        summary = {
            "turns_in": turns_in,
            "turns_out": turns_out,
            "elapsed_sec": round(elapsed, 1),
            "turns_per_sec": round(turns_in / elapsed, 1),
            "buckets": n_buckets,
            "buckets_done": done,
            "buckets_failed": failed,
            "processed": r["processed"],
        }
        assert turns_out == turns_in, summary
        assert done == n_buckets and failed == 0, summary
        with open(os.path.join(ROOT, "BENCH", "e2e_pipeline.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
