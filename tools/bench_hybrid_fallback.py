"""Adversarial-vocabulary bench for the hybrid annotator's broadcast
gate (VERDICT r5 item 3): time the SAME sf0.1 workload through both gate
outcomes — decisions under the bound (eager collect + local-DF broadcast
join-back) and over the bound (lazy decision subplan + shuffle
join-back) — and record timings plus plan facts to
BENCH/hybrid_fallback.json.

Usage: python tools/bench_hybrid_fallback.py [n_convs]
"""

from __future__ import annotations

import json
import sys
import time

from marie_ai_spark.operators import hybrid
from marie_ai_spark.operators.hybrid import hybrid_annotate
from marie_ai_spark.session import get_spark
from marie_ai_spark.sources.transcripts import gen_spark


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000  # ~ sf0.1
    spark = get_spark("bench-hybrid-fallback", master="local[32]")
    tr = gen_spark(spark, n_convs, seed=42)

    runs = {}
    for mode, kwargs in (
        ("broadcast", {}),
        ("shuffle_fallback", {"max_broadcast_decisions": 0}),
    ):
        best = None
        for _rep in range(2):
            t0 = time.monotonic()
            out = hybrid_annotate(tr, **kwargs)
            n = out.count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        plan = out._jdf.queryExecution().executedPlan().toString()
        runs[mode] = {
            "sec_min_of_2": round(best, 3),
            "rows": n,
            "gate_join": hybrid.LAST_CALL_INFO["join"],
            "n_decisions": hybrid.LAST_CALL_INFO["n_decisions"],
            "plan_has_arrow_stage": "ArrowEvalPython" in plan,
        }
        print(mode, runs[mode])

    assert runs["broadcast"]["gate_join"] == "broadcast-local"
    assert runs["shuffle_fallback"]["gate_join"] == "shuffle"
    assert runs["broadcast"]["rows"] == runs["shuffle_fallback"]["rows"]
    rec = {
        "what": (
            "hybrid_annotate broadcast-gate outcomes on the same input: "
            "the fallback keeps the decision subplan lazy and shuffle-"
            "joins it; output row-identical (test-asserted separately)"
        ),
        "n_convs": n_convs,
        "runs": runs,
        "overhead_x": round(
            runs["shuffle_fallback"]["sec_min_of_2"]
            / runs["broadcast"]["sec_min_of_2"],
            3,
        ),
    }
    with open("BENCH/hybrid_fallback.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
