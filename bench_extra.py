"""Extra benchmark instrumentation for optimization rounds (guide §1).

NOT part of the driver contract — bench.py stays frozen. This harness
isolates, per query:
  - build_s : wall time of the query-builder call fn(spark, sf_dir)
              (driver-side work: collects for centroids/query vectors,
              index writes, union-find, etc.)
  - exec_s  : wall time of the noop-sink materialization (guide §1.4)
  - jobs    : number of Spark jobs the query issued end to end
  - plan    : .explain("formatted") dumped to plans/r08/<q>_<tag>.txt

Usage:
  python bench_extra.py [--queries q_a,q_b] [--reps N] [--tag before]
  env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py)

Prints one JSON line per query to stdout and a total at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--tag", default="")
    ap.add_argument("--plans", action="store_true",
                    help="dump explain('formatted') per query")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import bench as benchmod
    import __spark_entry__ as entrymod
    from marie_ai_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    qs = entrymod.queries()
    names = [n for n in args.queries.split(",") if n] or list(benchmod.HEADLINE)
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r08")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    st = spark.sparkContext.statusTracker()
    results = {}
    total = 0.0
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        best = None
        for rep in range(max(args.reps, 1)):
            jobs0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs1 = len(st.getJobIdsForGroup(None) or [])
            rec = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs": jobs1 - jobs0,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
            if args.plans and rep == 0 and args.tag:
                with open(os.path.join(
                        plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
        results[name] = best
        total += best["total_s"]
        print(json.dumps({"q": name, **best}), flush=True)
    print(json.dumps({"metric": "bench_extra_total", "value": round(total, 2),
                      "n": len(names), "tag": args.tag}), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH", f"extra_{args.tag or 'run'}.json")
    try:
        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results,
                       "total": round(total, 2)}, f, indent=1)
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
