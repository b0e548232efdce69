"""Bucketed co-located joins: the write-time pre-shuffle must remove the
per-query exchange entirely."""

from pyspark.sql import functions as F

from marie_ai_spark.sources.tables import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse.dir is a static conf — tables land in the session default
    # warehouse and are dropped at the end
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = docs.select("doc_id", F.length("text").alias("n_chars"))
    write_bucketed(docs.select("doc_id", "lang"), "b_docs", "doc_id")
    write_bucketed(stats, "b_stats", "doc_id")

    # force sort-merge (no broadcast escape) so the bucket layout is what
    # removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_docs").join(spark.table("b_stats"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # bucketed-on-join-key tables sort-merge join with NO shuffle
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        assert j.count() == docs.count()

        # control: the same join over plain parquet DOES shuffle
        plain = docs.select("doc_id", "lang").join(stats, "doc_id")
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in pplan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in ("b_docs", "b_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
