"""Order-of-magnitude scale-up evidence run (round 5): the full durable
extraction pipeline over ~10x the standing e2e benchmark input (10M
conversations ~ 58M turns vs the 5.85M-turn record in
BENCH/e2e_pipeline.json), reporting:

  - turns/sec INCLUDING bucketed parquet writes + lineage (the honest
    e2e number),
  - peak JVM RSS sampled during the run (executor memory headroom),
  - small-file compaction follow-on: file count before/after.

The input is generated once (deterministic, seeded) and kept under
.bench_data/. Bucket count scales with input (256 at 10M convs) so
per-bucket task size stays in the same regime as the 64-bucket/1M run.

Usage: python tools/bench_e2e_scaleup.py [n_convs] [n_buckets]
Writes BENCH/e2e_scaleup.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _java_rss_kb() -> int:
    try:
        pids = subprocess.run(
            ["pgrep", "java"], capture_output=True, text=True
        ).stdout.split()
        total = 0
        for pid in pids:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        return total
    except OSError:
        return 0


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from marie_ai_spark.plans.pipeline import (
        compact_extracted,
        read_extracted,
        run_extract,
    )
    from marie_ai_spark.session import get_spark
    from marie_ai_spark.sources.transcripts import write_transcripts

    spark = get_spark("bench-e2e-scaleup")
    data = os.path.join(ROOT, ".bench_data", f"transcripts_{n_convs}")
    if not os.path.exists(data):
        t0 = time.perf_counter()
        write_transcripts(spark, data, n_convs=n_convs, seed=42)
        print(f"generated {data} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    peak = {"rss_kb": 0}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peak["rss_kb"] = max(peak["rss_kb"], _java_rss_kb())
            stop.wait(5)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()

    turns_in = spark.read.parquet(data).count()  # warms the page cache
    out = tempfile.mkdtemp(prefix="e2e_scaleup_")
    try:
        t0 = time.perf_counter()
        r = run_extract(spark, data, out, run_id="e2e10x",
                        n_buckets=n_buckets)
        elapsed = time.perf_counter() - t0
        turns_out = read_extracted(spark, out).count()
        lin = spark.read.parquet(f"{out}/lineage")
        done = lin.filter("status = 'done'").count()
        files_pre = sum(
            len([f for f in files if not f.startswith(("_", "."))])
            for _, _, files in os.walk(f"{out}/extracted")
        )
        t1 = time.perf_counter()
        comp = compact_extracted(spark, out)
        comp_elapsed = time.perf_counter() - t1
        stop.set()
        th.join(1)
        summary = {
            "n_convs": n_convs,
            "turns_in": turns_in,
            "turns_out": turns_out,
            "elapsed_sec": round(elapsed, 1),
            "turns_per_sec": round(turns_in / elapsed, 1),
            "buckets": n_buckets,
            "buckets_done": done,
            "processed": r["processed"],
            "peak_java_rss_gb": round(peak["rss_kb"] / 1024 / 1024, 2),
            "compaction": {
                "files_before": comp["files_before"] or files_pre,
                "files_after": comp["files_after"],
                "buckets_compacted": comp["buckets_compacted"],
                "elapsed_sec": round(comp_elapsed, 1),
            },
        }
        print(json.dumps(summary, indent=1))
        with open(os.path.join(ROOT, "BENCH", "e2e_scaleup.json"), "w") as f:
            json.dump(summary, f, indent=1)
        assert turns_in == turns_out, "row parity violated"
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
