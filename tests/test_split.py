"""Deterministic dataset splitting: fraction accuracy, engine parity
(DuckDB twin of the md5-bucket CASE), duplicate-cluster co-travel, and
the shuffle-free / broadcast-only plan gates."""

import duckdb
import pytest
from pyspark.sql import functions as F

from marie_ai_spark.operators import dedup, split

SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("src"),
    )


def test_fractions_and_determinism(spark, docs):
    out = split.hash_split(docs, "doc_id", SPLITS, salt="s1")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == 20_000
    for name, frac in SPLITS.items():
        assert abs(counts[name] / n - frac) < 0.01, (name, counts)
    # rerun is bit-identical (no RNG state)
    again = split.hash_split(docs, "doc_id", SPLITS, salt="s1")
    assert out.exceptAll(again).count() == 0


def test_duckdb_twin_parity(spark, docs):
    got = sorted(
        (r["doc_id"], r["split"])
        for r in split.hash_split(docs, "doc_id", SPLITS, salt="r6").collect()
    )
    want = duckdb.sql(
        """
        SELECT doc_id,
               CASE WHEN b < 900000 THEN 'train'
                    WHEN b < 950000 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT r AS doc_id,
                     ('0x' || substr(md5('split|r6' || CAST(r AS VARCHAR)), 1, 8))::BIGINT
                     % 1000000 AS b
              FROM range(20000) t(r))
        ORDER BY doc_id
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_independent_of_sampling_admission(spark, docs):
    """Regression: the md5-admission samplers keep rows with LOW
    unsalted md5(key) buckets; an un-domain-separated split hash would
    send every sampling survivor to 'train' and leave val/test EMPTY
    (observed with curate_job --mix-alpha + --holdout before the
    'split|' domain tag)."""
    from marie_ai_spark.operators import curation

    kept = curation.stratified_sample(
        docs, "src", {str(i): 0.5 for i in range(7)}, "doc_id"
    )
    out = split.hash_split(kept, "doc_id", SPLITS)  # default salt
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    for name, frac in SPLITS.items():
        assert counts.get(name, 0) > 0, (name, counts)
        assert abs(counts[name] / n - frac) < 0.015, (name, counts)


def test_salt_rerolls(spark, docs):
    a = split.hash_split(docs, "doc_id", SPLITS, salt="s1")
    b = split.hash_split(docs, "doc_id", SPLITS, salt="s2")
    moved = a.alias("a").join(b.alias("b"), "doc_id").filter(
        F.col("a.split") != F.col("b.split")
    )
    assert moved.count() > 500  # ~9.5% expected to change split


def test_bad_fractions_raise(docs):
    with pytest.raises(ValueError):
        split.hash_split(docs, "doc_id", {"train": 0.9, "val": 0.05})
    with pytest.raises(ValueError):
        split.hash_split(docs, "doc_id", {"all": 1.0})


def test_hash_split_plan_is_narrow(docs):
    plan = split.hash_split(docs, "doc_id", SPLITS)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan[:600]


def test_leakage_safe_co_travel(spark):
    # 3 duplicate "families" of 40 near-identical docs each + 380 unique
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs before the deadline",
        "how razorback jumping frogs can level six piqued gymnasts",
    ]
    rows = [(fam * 1000 + i, f"{base[fam]} variant {i % 2}")
            for fam in range(3) for i in range(40)]
    rows += [(9000 + i, f"unique document number {i} with its own words "
                        f"nothing shared here {i * 17}") for i in range(380)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = dedup.minhash_lsh_candidates(docs, n=3)
    clusters = dedup.duplicate_clusters(pairs)
    out = split.leakage_safe_split(
        docs.select("doc_id"), clusters, SPLITS, salt="r6"
    )
    assert out.count() == 500
    # no split_key (cluster or singleton) straddles two splits
    straddle = out.groupBy("split_key").agg(
        F.countDistinct("split").alias("k")
    ).filter(F.col("k") > 1)
    assert straddle.count() == 0
    # clustered docs really were keyed by their cluster, not themselves
    joined = out.join(clusters, "doc_id")
    assert joined.filter(F.col("split_key") != F.col("cluster_id")).count() == 0


def test_leakage_safe_plan_broadcasts(spark):
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    clusters = spark.createDataFrame(
        [(5, 1), (9, 1)], "doc_id bigint, cluster_id bigint"
    )
    plan = split.leakage_safe_split(docs, clusters, SPLITS)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:600]
    assert "SortMergeJoin" not in plan, plan[:600]


def test_leakage_safe_gate_fallback_above_bound(spark):
    """VERDICT r6 item 4: above max_broadcast_clusters the join must NOT
    be broadcast-hinted (the cluster table is corpus-fraction-sized at
    web scale) and the fallback output is row-identical to the broadcast
    form."""
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    clusters = spark.createDataFrame(
        [(i, i - i % 4) for i in range(0, 400, 2)],
        "doc_id bigint, cluster_id bigint",
    )
    hinted = split.leakage_safe_split(docs, clusters, SPLITS, salt="g")
    fallback = split.leakage_safe_split(
        docs, clusters, SPLITS, salt="g", max_broadcast_clusters=10
    )
    plan = fallback._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan[:600]
    assert fallback.exceptAll(hinted).count() == 0
    assert hinted.exceptAll(fallback).count() == 0
