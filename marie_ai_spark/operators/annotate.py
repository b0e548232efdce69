"""Annotators: configured regex rules over document text -> typed
annotation rows, and classification voting policies.

Reference semantics:
  - RegexAnnotator: a list of named regex rules is applied to the full
    document text; each match emits {name, value, type, confidence}
    (marie/extract/annotators/regex_annotator.py:52-90).
  - Classification voting policies MAJORITY / MAX_SCORE with tie-break
    strategies (ABSTAIN / BEST) over per-page classifier results
    (marie/pipe/voting.py:8-60).

Spark mapping: regexp_extract_all per rule + posexplode (JVM-side, no
Python); policies as two-stage aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ANNOTATION_RULES = [
    # (rule name, regex with one capture group, value type)
    ("number", r"(\d+(?:\.\d+)?)", "numeric"),
    ("url", r"(https?://[^\s\"']+)", "uri"),
    ("key_token", r"\b(spark|join|merge)\b", "keyword"),
]


def annotate_regex(
    documents: DataFrame,
    rules: list[tuple[str, str, str]] = DEFAULT_ANNOTATION_RULES,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One output row per (document, rule, match): the exploded relational
    form of the reference's annotation list."""
    per_rule = []
    for name, pattern, vtype in rules:
        per_rule.append(
            documents.select(
                F.col(id_col),
                F.lit(name).alias("rule"),
                F.lit(vtype).alias("value_type"),
                F.posexplode(
                    F.regexp_extract_all(F.col(text_col), F.lit(pattern), 1)
                ).alias("match_idx", "value"),
            )
        )
    out = per_rule[0]
    for df in per_rule[1:]:
        out = out.unionByName(df)
    return out


def classify_vote(
    results: DataFrame,
    key: str,
    label: str = "label",
    score: str = "score",
    policy: str = "majority",
    tie_break: str = "best",
    min_margin: float = 0.0,
    max_diff: float = 0.1,
) -> DataFrame:
    """Reduce per-classifier rows (key, label, score) to one decision per
    key.

    policy='majority': most votes wins; 'max_score': highest max score wins.
    tie_break='best': break by summed score then label; 'abstain': emit
    NULL winner when the top two are tied (within min_margin for scores);
    'best_with_diff' (marie/pipe/voting.py:122-133,213-230): on a vote tie
    (majority) or unconditionally (max_score), rank the INDIVIDUAL result
    scores of the eligible labels — the winner is the top result's label
    only when it beats the runner-up score by more than `max_diff`,
    otherwise the vote abstains (NULL winner).
    """
    agg = results.groupBy(key, label).agg(
        F.count(F.lit(1)).alias("votes"),
        F.round(F.max(score), 6).alias("max_score"),
        F.round(F.sum(score), 6).alias("sum_score"),
    )
    if policy == "majority":
        order = [F.desc("votes"), F.desc("sum_score"), F.asc(label)]
        top_metric = F.col("votes").cast("double")
    else:
        order = [F.desc("max_score"), F.desc("sum_score"), F.asc(label)]
        top_metric = F.col("max_score")

    w = Window.partitionBy(key).orderBy(*order)
    ranked = agg.withColumn("rn", F.row_number().over(w)).withColumn(
        "top_metric", top_metric
    )
    first = ranked.filter(F.col("rn") == 1)
    if tie_break == "abstain":
        second = ranked.filter(F.col("rn") == 2).select(
            F.col(key).alias("_k2"), F.col("top_metric").alias("runner_metric")
        )
        first = first.join(
            second, first[key] == second["_k2"], "left"
        ).withColumn(
            "winner",
            F.when(
                F.col("runner_metric").isNotNull()
                & (F.col("top_metric") - F.col("runner_metric") <= min_margin),
                F.lit(None).cast("string"),
            ).otherwise(F.col(label)),
        )
    elif tie_break == "best_with_diff":
        # Individual-result ranking (NOT the per-label aggregates): the
        # reference gates on the gap between the two best single scores.
        wm = Window.partitionBy(key)
        if policy == "majority":
            # eligible results: rows whose label holds the max vote count;
            # the gate engages only on a vote TIE (voting.py:106,122-133)
            lbl_votes = agg.withColumn("_mx", F.max("votes").over(wm)).withColumn(
                "_ties", F.sum((F.col("votes") == F.col("_mx")).cast("int")).over(wm)
            )
            eligible = results.join(
                lbl_votes.filter(F.col("votes") == F.col("_mx")).select(
                    F.col(key).alias("_ek"),
                    F.col(label).alias("_el"),
                    F.col("_ties"),
                ),
                (F.col(key) == F.col("_ek")) & (F.col(label) == F.col("_el")),
            )
        else:
            # max_score policy applies the gate unconditionally (:213-230)
            eligible = results.withColumn("_ties", F.lit(2))
        w2 = Window.partitionBy(key).orderBy(F.desc(score), F.asc(label))
        top2 = (
            eligible.withColumn("_rnk", F.row_number().over(w2))
            .filter(F.col("_rnk") <= 2)
            .groupBy(key)
            .agg(
                F.max(F.when(F.col("_rnk") == 1, F.col(score))).alias("_s1"),
                F.max(F.when(F.col("_rnk") == 1, F.col(label))).alias("_l1"),
                F.max(F.when(F.col("_rnk") == 2, F.col(score))).alias("_s2"),
                F.max("_ties").alias("_ties"),
            )
        )
        gated = F.when(
            F.col("_s2").isNull() | (F.col("_s1") - F.col("_s2") > max_diff),
            F.col("_l1"),
        ).otherwise(F.lit(None).cast("string"))
        first = first.join(top2, key).withColumn(
            "winner",
            F.when(F.col("_ties") >= 2, gated).otherwise(F.col(label)),
        )
    else:
        first = first.withColumn("winner", F.col(label))
    return first.select(
        F.col(key), "winner", "votes", "max_score", "sum_score"
    )


def fuzzy_annotate(
    documents: DataFrame,
    terms: list[str],
    max_dist: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fuzzy term matching over tokenized text — the relational form of the
    reference's fuzzy TextSelector strategy (marie/extract/models/base.py:
    204-212) and its multi-line matcher's approximate matching
    (marie/extract/annotators/multi_line_matcher.py).

    JVM-side: explode tokens with position, theta-join against the (tiny,
    broadcast) term table on levenshtein distance <= max_dist.
    """
    spark = documents.sparkSession
    term_df = spark.createDataFrame([(t,) for t in terms], "term string")
    toks = documents.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("tok_idx", "token"),
    ).filter(F.col("token") != "")
    return (
        toks.join(
            F.broadcast(term_df),
            F.levenshtein(F.lower("token"), F.lower("term")) <= max_dist,
        )
        .select(
            id_col,
            "term",
            "tok_idx",
            "token",
            F.levenshtein(F.lower("token"), F.lower("term")).alias("dist"),
        )
    )
