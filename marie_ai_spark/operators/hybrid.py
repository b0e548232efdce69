"""Hybrid lexical+embedding annotator (the FaissHybridAnnotator analog,
marie/extract/annotators/faiss_hybrid_annotator.py): dynamic line n-grams
-> fuzzy-first match against target labels -> embedding top-k with critical
boost + softmax -> per-document field dedup.

Spark shape (all JVM, no Python in the hot path):
  - candidates: one posexplode over lines + a flatten(transform(...)) ngram
    fan-out per line (sizes from token count, :615-625). Tokens are
    materialized before the ngram transform (projection-collapse trap).
  - labels: a 4-row broadcast with python-precomputed hashing-trick unit
    vectors (the deterministic FAISS replacement per SURVEY §8 — with this
    label count a brute-force cosine IS the full-probe index search).
  - fuzzy channel: levenshtein ratio vs every normalized label (:552-576);
    embedding channel gated off when fuzzy-direct fires (:492-543).
  - softmax over the top-k label scores runs as window aggregations over
    one candidate partition — a single exchange.
  - dedup: highest_confidence per (conv_id, label) (:654-668) via one
    row_number window, ordering on the ROUNDED score so the python twin
    (ref_ops/hybrid.py) and the distributed run break ties identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ref_ops.hybrid import (
    CRITICAL_BOOST,
    DEFAULT_CRITICAL,
    DEFAULT_TARGET_LABELS,
    EMBEDDING_WEIGHT,
    FUZZY_THRESHOLD,
    MIN_FINAL_SCORE,
    TOP_K,
    normalize_for_match,
)
from ..ref_ops.spans_engine import _EMBED_DIM, embed_line

_CAND_KEY = ["conv_id", "turn_idx", "line_no", "tok_start", "ngram_size"]


def _ngram_candidates(transcripts: DataFrame) -> DataFrame:
    lines = transcripts.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split("text", "\n")).alias("line_no", "line"),
    )
    toks = F.when(
        F.trim("line") == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim("line"), r"\s+"))
    with_toks = lines.select("conv_id", "turn_idx", "line_no", toks.alias("w"))
    n = F.size("w")
    max_size = (
        F.when(n <= 3, 2).when(n <= 7, 3).when(n <= 15, 4).otherwise(5)
    )
    ngrams = F.flatten(
        F.transform(
            F.sequence(F.lit(1), max_size),
            lambda j: F.when(
                n >= j,
                F.transform(
                    F.sequence(F.lit(0), n - j),
                    lambda i: F.struct(
                        i.cast("int").alias("tok_start"),
                        j.cast("int").alias("ngram_size"),
                        F.concat_ws(" ", F.slice("w", i + 1, j)).alias("ng"),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<tok_start:int,ngram_size:int,ng:string>>"
            )),
        )
    )
    return with_toks.select(
        "conv_id", "turn_idx", "line_no", F.explode(ngrams).alias("c")
    ).select(
        "conv_id",
        "turn_idx",
        "line_no",
        F.col("c.tok_start").alias("tok_start"),
        F.col("c.ngram_size").alias("ngram_size"),
        F.col("c.ng").alias("value"),
    )


def _embed_table(distinct_norms: DataFrame) -> DataFrame:
    """(norm, cvec): JVM hashing-trick embedding — the exact twin of
    ref_ops.spans_engine.embed_line (md5 byte0 -> bucket, byte1 -> sign,
    L2 normalized).

    Built relationally (explode tokens -> bucket sums -> map_from_entries
    -> dense 32-dim array) instead of a nested aggregate/zip_with
    higher-order expression: HOFs run on the expression interpreter and
    measured ~265us/row; the long form is codegen + one narrow aggregation.
    Bucket sums are small integers (exact in fp), so accumulation order
    cannot drift; the final normalize divides in index order like the twin."""
    toks = distinct_norms.select(
        "norm",
        F.explode(F.split(F.trim(F.lower("norm")), r"\s+")).alias("tok"),
    )
    md5 = F.md5("tok")
    contrib = toks.select(
        "norm",
        (F.conv(F.substring(md5, 1, 2), 16, 10).cast("int") % _EMBED_DIM).alias(
            "idx"
        ),
        F.when(
            F.conv(F.substring(md5, 3, 2), 16, 10).cast("int") % 2 == 0, F.lit(1.0)
        )
        .otherwise(F.lit(-1.0))
        .alias("sign"),
    )
    sums = contrib.groupBy("norm", "idx").agg(F.sum("sign").alias("val"))
    maps = sums.groupBy("norm").agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "val"))).alias("m")
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(_EMBED_DIM - 1)),
        lambda i: F.coalesce(F.element_at("m", i.cast("int")), F.lit(0.0)),
    )
    with_raw = maps.select("norm", raw.alias("raw"))
    nrm = F.sqrt(
        F.aggregate(F.col("raw"), F.lit(0.0), lambda a, v: a + v * v)
    )
    return with_raw.select(
        "norm",
        F.when(nrm > 0, F.transform("raw", lambda v: v / nrm))
        .otherwise(F.col("raw"))
        .alias("cvec"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _zero_cos_emits_nothing(labels: list[str], critical: list[str]) -> bool:
    """Twin-exact proof that a candidate with ZERO cosine against every
    label cannot pass MIN_FINAL_SCORE for THIS label configuration: with
    all-equal sims the twin ranks labels ascending, boosts criticals, and
    softmaxes — when the resulting max final is below the gate, any norm
    sharing no hash bucket with any label provably emits nothing, so the
    embedding channel may skip it entirely."""
    import math

    top = sorted(labels)[:TOP_K]
    if not top:
        return True
    raw = [
        (min(CRITICAL_BOOST, 1.0) if lbl in critical else 0.0)
        * EMBEDDING_WEIGHT
        for lbl in top
    ]
    mx = max(raw)
    exps = [math.exp(r - mx) for r in raw]
    return max(exps) / sum(exps) < MIN_FINAL_SCORE


def _label_buckets(label_rows) -> list[int]:
    """Hash buckets touched by any label token (embed_line's md5 byte0)."""
    import hashlib

    buckets = set()
    for _lbl, norm_label, _crit, _vec in label_rows:
        for tok in norm_label.lower().split():
            h = hashlib.md5(tok.encode("utf-8", "surrogatepass")).digest()
            buckets.add(h[0] % _EMBED_DIM)
    return sorted(buckets)


def hybrid_annotate(
    transcripts: DataFrame,
    labels: list[str] | None = None,
    critical: list[str] | None = None,
    dedup: bool = True,
) -> DataFrame:
    """(conv_id, label, strategy, value, turn_idx, line_no, tok_start,
    ngram_size, score). With dedup=True, one highest-confidence row per
    (conv_id, label)."""
    labels = labels if labels is not None else DEFAULT_TARGET_LABELS
    critical = critical if critical is not None else DEFAULT_CRITICAL
    spark = transcripts.sparkSession
    label_rows = [
        (
            lbl,
            normalize_for_match(lbl),
            lbl in critical,
            embed_line(normalize_for_match(lbl).lower()),
        )
        for lbl in sorted(labels)
    ]
    label_df = spark.createDataFrame(
        label_rows,
        "label string, norm_label string, is_critical boolean, lvec array<double>",
    )

    cands = _ngram_candidates(transcripts)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.upper("value"), r"[^\w\s]+", ""), r"\s+", " "
        )
    )
    # `normed` feeds both the distinct-norm scoring branch and the
    # join-back. A cache barrier here is MEASURED to pay for itself
    # (10.4s -> ~4.5s at sf0.1) now that the fuzzy channel is decoupled:
    # without it the candidate fan-out (and the upstream source subtree)
    # runs once per consumer. MEMORY_AND_DISK spills under pressure; at
    # cluster scale the equivalent barrier is a staging write of the
    # candidate table, the same pattern as the training pipeline.
    normed = (
        cands.select("*", norm.alias("norm")).filter(F.col("norm") != "").cache()
    )

    # The match decision is a pure function of the NORMALIZED text, so score
    # each distinct norm once and join the decision back — the corpus has
    # orders of magnitude more candidate occurrences than distinct n-grams
    # (dictionary-matching shape; measured 10x+ at sf0.1). Higher-order
    # expressions (the hashing embedding) are interpreter-bound, so pruning
    # their input set matters more than codegen tweaks.
    distinct_norms = normed.select("norm").distinct()

    # --- fuzzy channel: needs NO embeddings — a tiny broadcast crossjoin
    # and one aggregation decide fuzzy-direct per norm.
    # length gate: sim = 1 - lev/max <= 1 - |len_a - len_b|/max, so a pair
    # whose length gap alone puts it under FUZZY_THRESHOLD can never fire
    # the fuzzy-direct branch — skip the O(len^2) levenshtein for it and
    # pin its score to 0.0 (output-equivalent: sub-threshold fuzzy values
    # are discarded wholesale downstream)
    mx = F.greatest(F.length("norm"), F.length("norm_label"), F.lit(1))
    gap = F.abs(F.length("norm") - F.length("norm_label"))
    fuzzy = F.when(
        gap <= (1.0 - FUZZY_THRESHOLD) * mx,
        F.lit(1.0) - F.levenshtein("norm", "norm_label") / mx,
    ).otherwise(F.lit(0.0))
    fz = distinct_norms.crossJoin(
        F.broadcast(label_df.select("label", "norm_label"))
    ).select("norm", "label", fuzzy.alias("fuzzy"))
    # winner per norm via min(struct(-fuzzy, label)): highest fuzzy, then
    # lexicographically smallest label — an aggregation, not a window
    f_agg = fz.groupBy("norm").agg(
        F.max("fuzzy").alias("f_best"),
        F.min(
            F.struct((-F.col("fuzzy")).alias("nf"), F.col("label").alias("lbl"))
        ).alias("fw"),
    )
    fuzzy_direct = f_agg.filter(F.col("f_best") >= FUZZY_THRESHOLD).select(
        "norm",
        F.col("fw.lbl").alias("label"),
        F.lit("fuzzy-direct").alias("strategy"),
        F.round(-F.col("fw.nf"), 6).alias("score"),
    )

    # --- embedding channel: only norms the fuzzy channel did not claim,
    # prefiltered to those sharing at least one hash bucket with a label
    # token. A norm with zero bucket overlap has cosine EXACTLY 0 against
    # every label, and _zero_cos_emits_nothing proves the softmax gate
    # rejects such a candidate for this label set — so the prune is
    # output-equivalent, not approximate. (Bucket collisions only ever KEEP
    # extra norms.) This skips the interpreter-bound embedding build for
    # the vast majority of n-grams.
    emb_norms = f_agg.filter(F.col("f_best") < FUZZY_THRESHOLD).select("norm")
    if _zero_cos_emits_nothing(labels, critical):
        buckets = _label_buckets(label_rows)
        emb_norms = (
            emb_norms.select(
                "norm",
                F.explode(F.split(F.trim(F.lower("norm")), r"\s+")).alias("tok"),
            )
            .select(
                "norm",
                (F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("int")
                 % _EMBED_DIM).alias("idx"),
            )
            .filter(F.col("idx").isin(buckets))
            .select("norm")
            .distinct()
        )
    embedded = _embed_table(emb_norms)
    cos = _dot(F.col("cvec"), F.col("lvec"))
    scored = embedded.crossJoin(F.broadcast(label_df)).select(
        "*", cos.alias("cos")
    )
    we = Window.partitionBy("norm").orderBy(F.desc("cos"), F.asc("label"))
    emb = scored.select("*", F.row_number().over(we).alias("e_rn")).filter(
        F.col("e_rn") <= TOP_K
    )
    boosted = F.when(
        F.col("is_critical"), F.least(F.col("cos") + CRITICAL_BOOST, F.lit(1.0))
    ).otherwise(F.col("cos"))
    emb = emb.select("*", (boosted * EMBEDDING_WEIGHT).alias("raw"))
    # softmax over the norm's top-k via window aggregates (one exchange)
    wk = Window.partitionBy("norm")
    emb = emb.select(
        "*", F.max("raw").over(wk).alias("mx")
    ).select(
        "*", (F.exp(F.col("raw") - F.col("mx"))).alias("ex")
    ).select(
        "*", (F.col("ex") / F.sum("ex").over(wk)).alias("final")
    )
    wbest = Window.partitionBy("norm").orderBy(F.desc("final"), F.asc("label"))
    emb_best = (
        emb.withColumn("b_rn", F.row_number().over(wbest))
        .filter((F.col("b_rn") == 1) & (F.col("final") >= MIN_FINAL_SCORE))
        .select(
            "norm",
            "label",
            F.lit("embedding-softmax").alias("strategy"),
            F.round("final", 6).alias("score"),
        )
    )

    decisions = fuzzy_direct.unionByName(emb_best)
    out = normed.join(decisions, "norm").select(
        *_CAND_KEY, "value", "label", "strategy", "score"
    )
    if not dedup:
        return out.select(
            "conv_id", "label", "strategy", "value",
            "turn_idx", "line_no", "tok_start", "ngram_size", "score",
        )
    wd = Window.partitionBy("conv_id", "label").orderBy(
        F.desc("score"), "turn_idx", "line_no", "tok_start", "ngram_size"
    )
    return (
        out.withColumn("d_rn", F.row_number().over(wd))
        .filter(F.col("d_rn") == 1)
        .select(
            "conv_id", "label", "strategy", "value",
            "turn_idx", "line_no", "tok_start", "ngram_size", "score",
        )
    )
