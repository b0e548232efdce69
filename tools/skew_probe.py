"""Skew-handling probe: measure a hot-key join with and without AQE skew
splitting, and a holistic conversation reassembly with and without the
order-preserving chunk salt.

Evidence for the north rule's "explicit salting of skewed conv_id
partitions + AQE-driven shuffle tuning". Appends results to
BENCH/skew.json and prints them.

Run: python tools/skew_probe.py [--rows 4000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from marie_ai_spark.session import get_spark

    spark = get_spark(
        "skew-probe",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            # force sort-merge so the skew is visible (no broadcast escape)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        },
    )

    n = args.rows
    # 50% of rows share one conv_id ('conv-hot'); the rest are uniform
    base = spark.range(n).select(
        F.when(
            F.col("id") % 2 == 0, F.lit("conv-hot")
        ).otherwise(F.concat(F.lit("conv-"), (F.col("id") % 100000).cast("string")))
        .alias("conv_id"),
        (F.col("id")).alias("turn_idx"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(100001).select(
        F.when(F.col("id") == 100000, F.lit("conv-hot"))
        .otherwise(F.concat(F.lit("conv-"), F.col("id").cast("string")))
        .alias("conv_id"),
        F.rand(7).alias("weight"),
    )
    base.write.mode("overwrite").parquet("/tmp/skew_base")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    b = spark.read.parquet("/tmp/skew_base")
    d = spark.read.parquet("/tmp/skew_dim")

    def join_run():
        b.join(d, "conv_id").groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("c"), F.sum("weight").alias("w")
        ).write.format("noop").mode("overwrite").save()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_noskew = timed(join_run)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_skew = timed(join_run)

    # holistic reassembly: single-phase vs chunk-salted two-phase
    ext_like = b.select(
        "conv_id", "turn_idx", F.col("payload").alias("clean_text")
    )

    def single_phase():
        turn_key = F.struct(F.col("turn_idx"), F.col("clean_text"))
        ext_like.groupBy("conv_id").agg(
            F.length(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(turn_key)),
                        lambda s: s["clean_text"],
                    ),
                    "\n\n",
                )
            ).alias("len")
        ).write.format("noop").mode("overwrite").save()

    def two_phase():
        from marie_ai_spark.operators.rollup import conversation_text

        conversation_text(ext_like, chunk_turns=4096).select(
            "conv_id", F.length("conversation_text")
        ).write.format("noop").mode("overwrite").save()

    t_two = timed(two_phase)
    try:
        t_single = timed(single_phase)
    except Exception as ex:  # giant hot group can OOM the single reducer
        t_single = None
        print("single-phase failed:", str(ex)[:200], file=sys.stderr)

    # adaptive: the key-count pre-pass + whichever plan it picks
    def adaptive():
        from marie_ai_spark.operators.rollup import conversation_text

        conversation_text(
            ext_like, chunk_turns=4096, adaptive_threshold=100_000
        ).select("conv_id", F.length("conversation_text")).write.format(
            "noop"
        ).mode("overwrite").save()

    t_adaptive = timed(adaptive)

    # hot-shingle near-dup probe: one stop-shingle shared by `hot_docs`
    # documents makes the uncapped shared-shingle self-join emit hot_docs^2
    # rows; the DF cap drops it before the join.
    hot_docs = 4000
    docs = spark.range(20_000).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(
            F.when(F.col("id") < hot_docs, F.lit("common stop phrase "))
            .otherwise(F.lit("")),
            F.lit("unique body "),
            F.sha2(F.col("id").cast("string"), 256),
            F.lit(" "),
            F.sha2((F.col("id") + 1).cast("string"), 256),
            F.lit(" "),
            F.sha2((F.col("id") + 2).cast("string"), 256),
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet("/tmp/skew_docs")
    docs_p = spark.read.parquet("/tmp/skew_docs")

    from marie_ai_spark.operators import dedup

    def jaccard_uncapped():
        dedup.ngram_jaccard_pairs(docs_p, n=3, threshold=0.2).write.format(
            "noop"
        ).mode("overwrite").save()

    def jaccard_capped():
        dedup.ngram_jaccard_pairs(
            docs_p, n=3, threshold=0.2, max_shingle_df=100
        ).write.format("noop").mode("overwrite").save()

    t_j_capped = timed(jaccard_capped)
    t_j_uncapped = timed(jaccard_uncapped)

    out = {
        "rows": n,
        "hot_key_share": 0.5,
        "join_sec_skewjoin_off": t_noskew,
        "join_sec_skewjoin_on": t_skew,
        "reassembly_sec_single_phase": t_single,
        "reassembly_sec_chunk_salted": t_two,
        "reassembly_sec_adaptive": t_adaptive,
        "ngram_hot_shingle_docs": hot_docs,
        "ngram_sec_uncapped": t_j_uncapped,
        "ngram_sec_capped_df100": t_j_capped,
    }
    try:  # preserve manually-recorded sections (e.g. the 20M crossover)
        with open("BENCH/skew.json") as f:
            prev = json.load(f)
        out.update({k: v for k, v in prev.items() if k not in out})
    except (OSError, ValueError):
        pass
    with open("BENCH/skew.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
