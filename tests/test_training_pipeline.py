"""End-to-end training-data pipeline: quality gate, exact + near dedup,
tokenize/chunk composition."""

import pytest

from pyspark.sql import functions as F

from marie_ai_spark.plans.training_pipeline import (
    build_training_set,
    training_set_stats,
)
from marie_ai_spark.sources.transcripts import gen_pandas


@pytest.fixture(scope="module")
def transcripts(spark):
    df = gen_pandas(120, seed=17)
    # inject exact and near duplicates to make dedup load-bearing
    dup = df.head(6).copy()
    dup["conv_id"] = "conv-99999990"
    dup["turn_idx"] = range(6)
    near = df.head(1).copy()
    near["conv_id"] = "conv-99999991"
    near["turn_idx"] = [0]
    near["text"] = near["text"] + " extra tail word"
    import pandas as pd

    return spark.createDataFrame(
        pd.concat([df, dup, near], ignore_index=True)
    )


def test_pipeline_dedups_and_chunks(spark, transcripts):
    chunks = build_training_set(transcripts, max_len=64, overlap=16).cache()
    stats = training_set_stats(chunks).first()
    assert stats.n_chunks >= stats.n_docs > 0
    assert chunks.filter(F.col("chunk_len") > 64).count() == 0

    # the injected exact duplicates must not survive: their conv ids sort
    # higher than the originals, so no chunk may carry them
    assert chunks.filter(F.col("conv_id") == "conv-99999990").count() == 0

    # token streams are unique across surviving docs (exact dedup worked)
    docs = chunks.filter(F.col("chunk_idx") == 0).select(
        "conv_id", "turn_idx", F.col("chunk").cast("string").alias("c0")
    )
    n_docs = docs.count()
    # near-duplicate injection: the padded copy shares almost all 3-gram
    # shingles with its source, so at threshold 0.8 one of the two is gone
    assert docs.filter(F.col("conv_id") == "conv-99999991").count() == 0


def test_quality_gate_drops_short_docs(spark, transcripts):
    chunks = build_training_set(transcripts, min_chars=100000)
    assert chunks.count() == 0
