"""Round-7 scale evidence (VERDICT r6 item 7): run the two newest
zero-corpus-shuffle operators — hash_split and temperature_mixture_sample
— over the 58.7M-row corpus size of the standing e2e scale-up, proving
the plan shapes hold at 10x and recording throughput.

What is asserted, not just timed:
  - hash_split's physical plan contains NO Exchange (pure narrow CASE
    over the md5 bucket; the split is scan-local at any scale);
  - the mixture sampler's plan contains NO SortMergeJoin and NO Window
    (histogram + normalizer are tiny aggs, rates join back broadcast,
    admission is one narrow md5 filter).

Appends a `split_mix_58m_rows` section to BENCH/skew.json.

Run: python tools/split_mix_10x.py [--rows 58700000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=58_700_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from marie_ai_spark.operators.curation import temperature_mixture_sample
    from marie_ai_spark.operators.split import hash_split
    from marie_ai_spark.session import get_spark

    spark = get_spark(
        "split-mix-10x", master="local[32]", shuffle_partitions=64
    )
    n = args.rows

    # documents-shaped input: skewed lang histogram (en-heavy, Zipf-ish —
    # the shape temperature flattening exists for)
    def corpus():
        m = F.col("id") % 100
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(m < 50, "en")
            .when(m < 70, "de")
            .when(m < 85, "fr")
            .when(m < 93, "es")
            .when(m < 97, "pt")
            .when(m < 99, "pl")
            .otherwise("fi")
            .alias("lang"),
        )

    splits = {"train": 0.9, "val": 0.05, "test": 0.05}

    split_df = hash_split(corpus(), "doc_id", splits, salt="r7")
    split_plan = split_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in split_plan, split_plan[:600]

    t0 = time.perf_counter()
    split_counts = {
        r["split"]: r["n"]
        for r in split_df.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    split_sec = round(time.perf_counter() - t0, 2)
    assert sum(split_counts.values()) == n
    for name, frac in splits.items():
        got = split_counts[name] / n
        assert abs(got - frac) < 0.001, (name, got)

    mix_df = temperature_mixture_sample(
        corpus(), source_col="lang", key_col="doc_id",
        alpha=0.5, target_frac=0.5,
    )
    mix_plan = mix_df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in mix_plan, mix_plan[:600]
    assert "Window" not in mix_plan, mix_plan[:600]

    t0 = time.perf_counter()
    mix_by_lang = {
        r["lang"]: r["n"]
        for r in mix_df.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    mix_sec = round(time.perf_counter() - t0, 2)
    mix_kept = sum(mix_by_lang.values())
    assert 0.4 * n < mix_kept < 0.6 * n, mix_kept
    # flattening: the tail language keeps a HIGHER fraction than the head
    head_rate = mix_by_lang["en"] / (0.50 * n)
    tail_rate = mix_by_lang["fi"] / (0.01 * n)
    assert tail_rate > head_rate, (head_rate, tail_rate)

    entry = {
        "rows": n,
        "hash_split": {
            "sec": split_sec,
            "rows_per_sec": round(n / split_sec),
            "plan_exchanges": 0,
            "split_counts": split_counts,
        },
        "temperature_mixture": {
            "sec": mix_sec,
            "rows_per_sec": round(n / mix_sec),
            "kept": mix_kept,
            "kept_frac": round(mix_kept / n, 4),
            "head_en_keep_rate": round(head_rate, 4),
            "tail_fi_keep_rate": round(tail_rate, 4),
            "plan": "broadcast rates, no sort-merge join, no window",
        },
    }
    with open("BENCH/skew.json") as f:
        data = json.load(f)
    data["split_mix_58m_rows"] = entry
    with open("BENCH/skew.json", "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
