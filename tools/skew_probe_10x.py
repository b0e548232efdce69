"""Round-6 skew round-trip at the 10x input size (VERDICT r5 item 8):
re-run the 50%-hot-key probes at 58.7M rows — the row count of the
round-5 e2e scale-up — to confirm the chunk-salted reassembly and the
AQE skew join hold where the single-phase hot group is hopeless.
Appends a `roundtrip_58m_rows` section to BENCH/skew.json.

Run: SPARK_DRIVER_MEM=48g python tools/skew_probe_10x.py [--rows 58700000]
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
    ap.add_argument("--rows", type=int, default=58_700_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from marie_ai_spark.session import get_spark

    spark = get_spark(
        "skew-probe-10x",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        },
    )

    n = args.rows
    base = spark.range(n).select(
        F.when(
            F.col("id") % 2 == 0, F.lit("conv-hot")
        ).otherwise(
            F.concat(F.lit("conv-"), (F.col("id") % 100000).cast("string"))
        ).alias("conv_id"),
        (F.col("id")).alias("turn_idx"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(100001).select(
        F.when(F.col("id") == 100000, F.lit("conv-hot"))
        .otherwise(F.concat(F.lit("conv-"), F.col("id").cast("string")))
        .alias("conv_id"),
        F.rand(7).alias("weight"),
    )
    base.write.mode("overwrite").parquet("/tmp/skew10x_base")
    dim.write.mode("overwrite").parquet("/tmp/skew10x_dim")
    b = spark.read.parquet("/tmp/skew10x_base")
    d = spark.read.parquet("/tmp/skew10x_dim")

    def join_run():
        b.join(d, "conv_id").groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("c"), F.sum("weight").alias("w")
        ).write.format("noop").mode("overwrite").save()

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_noskew = timed(join_run)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_skew = timed(join_run)

    ext_like = b.select(
        "conv_id", "turn_idx", F.col("payload").alias("clean_text")
    )

    def two_phase():
        from marie_ai_spark.operators.rollup import conversation_text

        conversation_text(ext_like, chunk_turns=4096).select(
            "conv_id", F.length("conversation_text")
        ).write.format("noop").mode("overwrite").save()

    t_two = timed(two_phase)

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

    single_outcome = None
    t_single = None
    try:
        t_single = timed(single_phase)
    except Exception as ex:
        single_outcome = f"failed: {str(ex)[:180]}"
        print("single-phase failed:", str(ex)[:300], file=sys.stderr)

    section = {
        "rows": n,
        "hot_key_share": 0.5,
        "join_sec_skewjoin_off": t_noskew,
        "join_sec_skewjoin_on": t_skew,
        "reassembly_sec_chunk_salted": t_two,
        "reassembly_sec_single_phase": t_single,
        "single_phase_outcome": single_outcome or "completed",
    }
    with open("BENCH/skew.json") as f:
        rec = json.load(f)
    rec["roundtrip_58m_rows"] = section
    with open("BENCH/skew.json", "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(section))
    spark.stop()


if __name__ == "__main__":
    main()
