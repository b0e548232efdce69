"""Idempotent mid-run resume against the lineage table (FIXTURES.md §4):
run with an injected stop after K partitions, re-run with the same run_id,
assert exactly one output row per (conv_id, turn_idx) and that the first K
partitions were not reprocessed."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from marie_ai_spark.plans.pipeline import read_extracted, run_extract
from marie_ai_spark.sources.transcripts import gen_pandas

N_BUCKETS = 8
K = 3


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    inp = str(root / "transcripts")
    out = str(root / "out")
    spark.createDataFrame(gen_pandas(100, seed=7)).write.parquet(inp)
    return inp, out


def test_resume_no_duplicates(spark, paths):
    inp, out = paths
    n_input = spark.read.parquet(inp).count()

    r1 = run_extract(spark, inp, out, run_id="run-a", n_buckets=N_BUCKETS,
                     max_buckets=K)
    assert r1["processed"] == K

    lin1 = spark.read.parquet(f"{out}/lineage").toPandas()
    assert set(lin1.partition_id) == set(range(K)) and (lin1.status == "done").all()

    r2 = run_extract(spark, inp, out, run_id="run-a", n_buckets=N_BUCKETS)
    assert r2["skipped"] == K
    assert r2["processed"] == N_BUCKETS - K

    ext = read_extracted(spark, out)
    assert ext.count() == n_input
    dups = (
        ext.groupBy("conv_id", "turn_idx")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0

    lin2 = spark.read.parquet(f"{out}/lineage").toPandas()
    # first K partitions appear exactly once -> not reprocessed on resume
    counts = lin2.groupby("partition_id").size()
    assert (counts == 1).all() and len(counts) == N_BUCKETS
    assert int(lin2.rows_out.sum()) == n_input
    assert (lin2.rows_in.values == lin2.rows_out.values).all()

    # third invocation: nothing left to do
    r3 = run_extract(spark, inp, out, run_id="run-a", n_buckets=N_BUCKETS)
    assert r3["processed"] == 0 and r3["skipped"] == N_BUCKETS


def test_bucket_checksums_deterministic(spark, paths):
    inp, out = paths
    lin = spark.read.parquet(f"{out}/lineage").toPandas()
    # recompute checksums from the final extracted table; must match lineage
    ext = spark.read.parquet(f"{out}/extracted")
    chk = (
        ext.groupBy("_bucket")
        .agg(
            F.sum(F.xxhash64("conv_id", "turn_idx").cast("decimal(38,0)"))
            .cast("string")
            .alias("c")
        )
        .toPandas()
        .set_index("_bucket")["c"]
    )
    lin_chk = lin.set_index("partition_id")["checksum"]
    assert {int(k): v for k, v in chk.items()} == {
        int(k): v for k, v in lin_chk.items()
    }


def test_failed_attempt_recorded_then_retry_succeeds(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(gen_pandas(30, seed=21)).write.parquet(inp)

    bad_rules = [{
        "rule_id": "boom", "doc_kind": "plain", "kind": "regex",
        "start_expr": "(unclosed", "stop_expr": None,
        "selection_type": "NEGATION", "label": "x",
    }]
    with pytest.raises(Exception):
        run_extract(spark, inp, out, run_id="r-f", n_buckets=4, rules=bad_rules)

    lin = spark.read.parquet(f"{out}/lineage").toPandas()
    assert (lin.status == "failed").all()
    assert (lin.attempt == 1).all()

    # retry with good rules: all buckets reprocessed, attempt=2, no dups
    r = run_extract(spark, inp, out, run_id="r-f", n_buckets=4)
    assert r["processed"] == 4
    lin2 = spark.read.parquet(f"{out}/lineage").toPandas()
    done = lin2[lin2.status == "done"]
    assert (done.attempt == 2).all() and len(done) == 4
    n_in = spark.read.parquet(inp).count()
    ext = read_extracted(spark, out)
    assert ext.count() == n_in


def test_merge_extracted_new_wins(spark, tmp_path):
    from marie_ai_spark.operators.extract import extract_transcripts
    from marie_ai_spark.plans.pipeline import merge_extracted

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(gen_pandas(25, seed=9)).write.parquet(inp)
    run_extract(spark, inp, out, run_id="m", n_buckets=4)
    before = read_extracted(spark, out).toPandas()

    # re-extract two turns with different rules (no cutpoints) as updates
    upd_src = spark.createDataFrame(gen_pandas(25, seed=9)).filter(
        "conv_id = 'conv-00000000'"
    )
    updates = extract_transcripts(upd_src, rules=[]).withColumn(
        "clean_text", F.concat(F.lit("UPDATED "), F.col("clean_text"))
    )
    n_buckets_touched = merge_extracted(spark, out, updates, n_buckets=4)
    assert 1 <= n_buckets_touched <= 4

    after = read_extracted(spark, out).toPandas()
    assert len(after) == len(before)  # upsert, no dup keys
    got = after[after.conv_id == "conv-00000000"]
    assert got.clean_text.str.startswith("UPDATED").all()  # new wins
    other = after[after.conv_id != "conv-00000000"].reset_index(drop=True)
    other_before = before[before.conv_id != "conv-00000000"].reset_index(drop=True)
    assert (other.clean_text.values == other_before.clean_text.values).all()


def test_merge_differential_vs_golden_replay(spark, tmp_path):
    """MERGE-semantics differential: a random SEQUENCE of upsert batches
    applied through merge_extracted (bucket-rewrite emulation of Iceberg
    MERGE INTO) must equal a pure-python last-write-wins replay over the
    same batches — inserts of new keys, updates of existing keys, and
    repeated touches of the same key across batches. This pins the
    emulated backend to the transactional semantics the Iceberg jar would
    provide (jar unavailable offline — constraint re-verified this round)."""
    import random

    from marie_ai_spark.plans.pipeline import merge_extracted

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame(gen_pandas(20, seed=5)).write.parquet(inp)
    run_extract(spark, inp, out, run_id="g", n_buckets=4)

    base_df = read_extracted(spark, out)
    cols = list(base_df.columns)
    # collect() keeps python-native cells (Rows/lists/datetime), which
    # createDataFrame round-trips exactly under the strict schema
    golden = {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in cols)
        for r in base_df.collect()
    }
    rng = random.Random(11)
    keys = sorted(golden)
    for step in range(3):
        batch = []
        # update a random sample of existing keys
        for cid, tix in rng.sample(keys, 7):
            row = list(golden[(cid, tix)])
            row[cols.index("clean_text")] = f"upd-{step}-{cid}-{tix}"
            batch.append(tuple(row))
        # insert brand-new keys (fresh conv ids hash into arbitrary buckets)
        for j in range(3):
            row = list(golden[keys[0]])
            row[cols.index("conv_id")] = f"new-{step}-{j}"
            row[cols.index("turn_idx")] = 0
            row[cols.index("clean_text")] = f"ins-{step}-{j}"
            batch.append(tuple(row))
        upd = spark.createDataFrame(batch, schema=read_extracted(spark, out).schema)
        merge_extracted(spark, out, upd, n_buckets=4)
        for row in batch:
            golden[(row[cols.index("conv_id")], row[cols.index("turn_idx")])] = row

    got = {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in cols)
        for r in read_extracted(spark, out).collect()
    }
    assert set(got) == set(golden)
    diffs = {k for k in got if got[k] != golden[k]}
    assert not diffs, sorted(diffs)[:5]
