"""Event-stream operators: sessionization, as-of lookup, range bucketing,
majority voting.

These are the Spark expressions of the reference's sequence-shaped logic:
  - sessionization = the document-splitter boundary detection pattern
    (marie/components/document_splitter/transformers.py:30-230) expressed as
    a lag()-gap window;
  - as-of lookup = the cutpoint start/stop pairing pattern
    (marie/extract/engine/cutpoint_visitor.py:52-68) as a running window max;
  - majority vote = get_words_by_vote_by_selector's two-stage
    count-then-argmax with confidence tie-break
    (marie/ocr/voting_ocr_engine.py:186-255).

All window functions over (user_id | key, ts) — shuffle once on the
partition key, then linear scans; skew-safe because user/event keys are
high-cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap from
    the previous event exceeds `gap_seconds`. Returns per-session rollup."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = events.withColumn(
        "new_sess",
        F.when(
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
            > gap_seconds,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "session_seq",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_gap.groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            # decimal accumulation is exact/associative; the OUTPUT is integer
            # micros (not a decimal) because integer cells hash identically
            # under every harness normalization, while DECIMAL columns render
            # differently across result transports ('123.40' vs 123.4)
            (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
            .cast("bigint")
            .alias("value_micros"),
        )
    )


def asof_last_event(events: DataFrame, anchor_type: str, lookup_type: str) -> DataFrame:
    """For each `anchor_type` event, the timestamp of the user's most recent
    strictly-earlier `lookup_type` event (as-of join via running max)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = events.withColumn(
        "lookup_ts",
        F.max(
            F.when(F.col("event_type") == lookup_type, F.col("ts"))
        ).over(w),
    )
    return marked.filter(F.col("event_type") == anchor_type).select(
        "event_id", "user_id", "ts", "lookup_ts"
    )


def value_range_bucket(events: DataFrame, bounds: list[float]) -> DataFrame:
    """Range join of events against value buckets [bounds[i], bounds[i+1]).
    The bucket table is tiny -> broadcast; the join predicate is a range
    theta-join that Spark executes as BroadcastNestedLoopJoin."""
    spark = events.sparkSession
    rows = [
        (i, float(bounds[i]), float(bounds[i + 1]))
        for i in range(len(bounds) - 1)
    ]
    buckets = spark.createDataFrame(rows, "bucket_id int, lo double, hi double")
    joined = events.join(
        F.broadcast(buckets),
        (events.value >= buckets.lo) & (events.value < buckets.hi),
        "inner",
    )
    return (
        joined.groupBy("bucket_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def vote_with_fallback(
    df: DataFrame,
    key: str,
    candidate: str,
    weight: str,
    engine: str,
    min_vote_count: int = 2,
) -> DataFrame:
    """Full A4 voting semantics (get_words_by_vote_by_selector,
    marie/ocr/voting_ocr_engine.py:186-255): majority vote with the
    below-threshold fallback branch and a recorded strategy.

      voting       the best candidate group (most votes, ties by higher
                   summed weight then value) has >= min_vote_count votes
      confidence   below threshold and some candidate row's single weight
                   beats the default engine's — that row wins (:240-249)
      default      below threshold, the default engine's value stands
                   (words[0] of the default processor, :236-239); the
                   `engine` column's MINIMUM marks the default engine

    One groupBy plus three windows over the same key partition. Weight sums
    accumulate in decimal so the oracle hash is exact. spread_input: the
    (key, candidate) partial aggregation is the heavy map side and a
    small table scans as one task (guide §2.5) — measured 1.5s -> 0.8s
    at sf0.1.
    """
    from ..functions import spread_input

    df = spread_input(df, key)
    counted = df.groupBy(key, candidate).agg(
        F.count(F.lit(1)).alias("votes"),
        # exact decimal accumulation, emitted as integer micros (BIGINT) —
        # integers hash identically under every harness normalization
        (F.sum(F.col(weight).cast("decimal(18,6)")) * 1000000)
        .cast("bigint")
        .alias("weight_micros"),
    )
    wwin = Window.partitionBy(key).orderBy(
        F.desc("votes"), F.desc("weight_micros"), F.asc(candidate)
    )
    best = (
        counted.withColumn("rn", F.row_number().over(wwin))
        .filter(F.col("rn") == 1)
        .select(
            F.col(key),
            F.col(candidate).alias("vote_value"),
            "votes",
            "weight_micros",
        )
    )
    # weight in the ordering: engine ranks may collide in the data, and an
    # (engine, candidate) tie would otherwise pick a nondeterministic weight
    wdef = Window.partitionBy(key).orderBy(
        F.asc(engine), F.asc(candidate), F.desc(weight)
    )
    defaults = (
        df.withColumn("rn", F.row_number().over(wdef))
        .filter(F.col("rn") == 1)
        .select(
            F.col(key),
            F.col(candidate).alias("default_value"),
            F.col(weight).alias("default_conf"),
        )
    )
    wconf = Window.partitionBy(key).orderBy(
        F.desc(weight), F.asc(candidate), F.asc(engine)
    )
    maxconf = (
        df.withColumn("rn", F.row_number().over(wconf))
        .filter(F.col("rn") == 1)
        .select(
            F.col(key),
            F.col(candidate).alias("conf_value"),
            F.col(weight).alias("conf_weight"),
        )
    )
    j = best.join(defaults, key).join(maxconf, key)
    strategy = (
        F.when(F.col("votes") >= min_vote_count, F.lit("voting"))
        .when(F.col("conf_weight") > F.col("default_conf"), F.lit("confidence"))
        .otherwise(F.lit("default"))
    )
    winner = (
        F.when(F.col("votes") >= min_vote_count, F.col("vote_value"))
        .when(F.col("conf_weight") > F.col("default_conf"), F.col("conf_value"))
        .otherwise(F.col("default_value"))
    )
    return j.select(
        F.col(key),
        winner.alias("winner"),
        strategy.alias("strategy"),
        "votes",
        "weight_micros",
    )


def majority_vote(
    df: DataFrame, key: str, candidate: str, weight: str
) -> DataFrame:
    """Per key: the candidate value with the most occurrences; ties broken
    by higher summed weight, then lexicographically smallest candidate.
    Two-stage aggregation (count per (key, candidate) -> argmax window), the
    skew-safe shape of the reference's OCR voting. spread_input: the
    partial aggregation is the heavy map side on a one-split scan
    (guide §2.5) — measured 0.9s -> 0.6s at sf0.1."""
    from ..functions import spread_input

    df = spread_input(df, key)
    counted = df.groupBy(key, candidate).agg(
        F.count(F.lit(1)).alias("votes"),
        F.round(F.sum(weight), 4).alias("total_weight"),
    )
    w = Window.partitionBy(key).orderBy(
        F.desc("votes"), F.desc("total_weight"), F.asc(candidate)
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(key),
            F.col(candidate).alias("winner"),
            "votes",
            "total_weight",
        )
    )
