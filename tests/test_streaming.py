"""Structured Streaming: incremental exactly-once extraction with
Trigger.AvailableNow across two file-arrival batches, and the watermarked
windowed rollup."""

import pytest

from pyspark.sql import functions as F

from marie_ai_spark.sources.transcripts import gen_pandas
from marie_ai_spark.streaming.incremental import (
    stream_extract,
    streaming_kind_counts,
)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    return str(root / "in"), str(root / "out"), str(root / "ckpt")


def test_incremental_exactly_once(spark, dirs):
    inp, out, ckpt = dirs
    batch1 = gen_pandas(40, seed=1)
    batch2 = gen_pandas(40, seed=2, conv_offset=1000)

    spark.createDataFrame(batch1).write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt)
    got1 = spark.read.parquet(out)
    assert got1.count() == len(batch1)

    # second invocation with no new data: no duplicates
    stream_extract(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == len(batch1)

    # new files land -> only the delta is processed
    spark.createDataFrame(batch2).write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt)
    final = spark.read.parquet(out)
    assert final.count() == len(batch1) + len(batch2)
    assert (
        final.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
        == 0
    )


def test_streaming_windowed_rollup_matches_batch(spark, dirs):
    inp, _out, _ckpt = dirs
    from marie_ai_spark.sources.transcripts import TRANSCRIPTS_DDL

    stream = spark.readStream.schema(TRANSCRIPTS_DDL).parquet(inp)
    agg = streaming_kind_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("kind_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "select role, sum(n_turns) as n from kind_counts group by role"
    ).collect()
    # append mode emits only watermark-closed windows; compare against the
    # batch rollup restricted to the same closed windows
    batch = spark.read.parquet(inp)
    max_ts = batch.agg(F.max("ts")).first()[0]
    closed = batch.filter(
        F.window("ts", "1 hour")["end"]
        <= F.lit(max_ts) - F.expr("interval 2 hours")
    )
    want = {
        r.role: r.n
        for r in closed.groupBy("role").agg(F.count("*").alias("n")).collect()
    }
    assert {r.role: r.n for r in got} == want
