"""Hybrid lexical+embedding annotator (the FaissHybridAnnotator analog,
marie/extract/annotators/faiss_hybrid_annotator.py): dynamic line n-grams
-> fuzzy-first match against target labels -> embedding top-k with critical
boost + softmax -> per-document field dedup.

Spark shape (corpus hot path JVM-only; Python only on the DISTINCT-norm
dictionary side, as one vectorized Arrow batch stage):
  - candidates: one posexplode over lines + a flatten(transform(...)) ngram
    fan-out per line (sizes from token count, :615-625). Each raw token is
    normalized ONCE per line and the n-gram's normalized form is a pure
    array op (array_join of the token slice) — the previous per-ngram
    double regexp_replace was ~5x the regex work for the same strings.
  - fuzzy channel: levenshtein ratio vs every normalized label (:552-576),
    restricted to distinct norms whose LENGTH can possibly reach the 0.8
    cutoff against any label (sim = 1 - lev/max <= 1 - |la-lb|/max, so a
    norm outside [T*min_label_len, max_label_len/T] provably cannot fire
    fuzzy-direct and skips the crossjoin entirely).
  - embedding channel: norms the fuzzy channel did not claim, scored by a
    VECTORIZED pandas UDF (md5 hashing-trick embedding -> cosine vs the
    tiny label set -> top-k + critical boost + softmax), one Arrow batch
    at a time with numpy accumulation. The match decision is a pure
    function of the normalized text, so this runs once per DISTINCT norm
    (dictionary-matching shape; the corpus has 10x+ more occurrences than
    distinct n-grams) — the 100 TB cost scales with vocabulary, not rows.
    The previous all-JVM higher-order-function build of the same numbers
    ran on the expression interpreter (no codegen) and measured ~3x
    slower; per the north rule the Arrow batch IS the sanctioned Python
    surface.
  - dedup: highest_confidence per (conv_id, label) (:654-668) via one
    row_number window, ordering on the ROUNDED score so the python twin
    (ref_ops/hybrid.py) and the distributed run break ties identically.
  - join-back of the per-norm decisions onto candidate occurrences is an
    explicit broadcast (decisions ~ matched vocabulary, always tiny next
    to the candidate table — never shuffle the fan-out).

Lifecycle (`materialize=`): the candidate fan-out has two consumers
(distinct-norm scoring, join-back). The default "none" recomputes it for
the join-back — the fan-out is narrow (posexplode + array ops, no
shuffle), so the recompute costs one extra corpus scan and NOTHING is
persisted past the call (a session-lifetime MEMORY_AND_DISK persist of a
bigger-than-corpus relation is exactly what a 100 TB job must not
accumulate). "persist" caches the fan-out for the duration of the
decision pass + join-back (caller clears the session cache when done —
the bench harness does); "staging" writes the fan-out to a temp parquet
dir both passes read (the training-pipeline barrier pattern).

The per-norm decisions are computed EAGERLY through a bounded
count-over-localCheckpoint gate (the dedup.py pattern, round 8): at or
under the bound the decisions become a local DataFrame and the join-back
broadcasts it (the fan-out never shuffles); over the bound (vocabulary
too big to broadcast safely) the join-back joins the already-
checkpointed decision table by shuffle instead of overflowing the
driver — never a driver collect, never a recompute of the scoring pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark import StorageLevel
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

# diagnostics for tests/bench: which join-back strategy the bounded
# broadcast gate chose on the most recent hybrid_annotate call
LAST_CALL_INFO: dict = {"join": None, "n_decisions": None}


def _ngram_candidates(transcripts: DataFrame) -> DataFrame:
    lines = transcripts.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split("text", "\n")).alias("line_no", "line"),
    )
    toks = F.when(
        F.trim("line") == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim("line"), r"\s+"))
    # normalize every raw token once (upper, strip punct); tokens carry no
    # whitespace, so joining the normalized non-empty slice with single
    # spaces equals normalize_for_match of the joined raw slice
    nt = F.transform(
        F.col("w"), lambda t: F.regexp_replace(F.upper(t), r"[^\w\s]+", "")
    )
    with_toks = lines.select(
        "conv_id", "turn_idx", "line_no", toks.alias("w")
    ).select("conv_id", "turn_idx", "line_no", "w", nt.alias("nt"))
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
                        F.array_join(
                            F.filter(
                                F.slice("nt", i + 1, j), lambda t: t != ""
                            ),
                            " ",
                        ).alias("norm"),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<tok_start:int,ngram_size:int,ng:string,norm:string>>"
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
        F.col("c.norm").alias("norm"),
    )


def _embed_score_udf(label_rows):
    """Vectorized scorer for the embedding channel: norm string -> winning
    (label, final-softmax score) or null. Twin-exact arithmetic:
      - bucket sums are small integers (exact in fp, order-free);
      - cosine and the softmax total accumulate in INDEX ORDER (np.cumsum
        is a running sum) matching the twin's sequential sums, so results
        are bit-identical to ref_ops.hybrid.hybrid_match;
      - top-k selection ranks by (cos desc, label asc) via a stable
      argsort over the label-ascending matrix; the winner among the top-k
      ranks by (raw desc, label asc) — softmax is monotone in raw, so the
      winner by final IS the winner by raw, incl. exact ties.
    """
    lbls = [r[0] for r in label_rows]  # label-ascending order
    crit = np.array([r[2] for r in label_rows])
    lmat = np.array([r[3] for r in label_rows], dtype=np.float64)
    n_lbl = len(lbls)
    k = min(TOP_K, n_lbl)
    tok_cache: dict = {}

    def _tok(tok):
        hit = tok_cache.get(tok)
        if hit is None:
            import hashlib

            h = hashlib.md5(tok.encode("utf-8", "surrogatepass")).digest()
            hit = (h[0] % _EMBED_DIM, 1.0 if h[1] % 2 == 0 else -1.0)
            tok_cache[tok] = hit
        return hit

    def fn(norms: pd.Series) -> pd.DataFrame:
        m = len(norms)
        if m == 0:
            return pd.DataFrame({"label": [], "final": []})
        if n_lbl == 0:
            # a scalar pandas UDF must return one row per input row —
            # an empty frame here would crash the Arrow stage with a
            # length mismatch when the label set is empty
            return pd.DataFrame(
                {"label": [None] * m, "final": [np.nan] * m}
            )
        vec = np.zeros((m, _EMBED_DIM), dtype=np.float64)
        rows, cols, signs = [], [], []
        for ri, s in enumerate(norms):
            for tok in s.lower().split():
                b, sg = _tok(tok)
                rows.append(ri)
                cols.append(b)
                signs.append(sg)
        if rows:
            np.add.at(vec, (np.array(rows), np.array(cols)), np.array(signs))
        # L2 normalize (sum of integer squares is exact, order-free)
        nrm = np.sqrt((vec * vec).sum(axis=1))
        nz = nrm > 0
        vec[nz] = vec[nz] / nrm[nz, None]
        # cosine per label, accumulated in index order (cumsum = running
        # sum) to match the twin's sequential zip-sum exactly
        cos = np.empty((m, n_lbl), dtype=np.float64)
        for li in range(n_lbl):
            cos[:, li] = np.cumsum(vec * lmat[li], axis=1)[:, -1]
        # top-k by (cos desc, label asc): stable sort keeps the
        # label-ascending base order on ties
        order = np.argsort(-cos, axis=1, kind="stable")[:, :k]
        top_cos = np.take_along_axis(cos, order, axis=1)
        top_crit = crit[order]
        raw = np.where(
            top_crit, np.minimum(top_cos + CRITICAL_BOOST, 1.0), top_cos
        ) * EMBEDDING_WEIGHT
        mx = raw.max(axis=1)
        exps = np.exp(raw - mx[:, None])
        tot = np.cumsum(exps, axis=1)[:, -1]  # rank-order running sum
        finals = exps / tot[:, None]
        # winner by (raw desc, label asc) — NOT by rank position: a
        # boosted lower-cos critical can tie a higher-cos label, and
        # the twin breaks that tie on label alone
        wkeys = np.lexsort((order, -raw), axis=1)[:, 0]
        ar = np.arange(m)
        win_final = finals[ar, wkeys]
        win_lbl = np.array(lbls, dtype=object)[order[ar, wkeys]]
        ok = win_final >= MIN_FINAL_SCORE
        return pd.DataFrame(
            {
                "label": np.where(ok, win_lbl, None),
                "final": np.where(ok, win_final, np.nan),
            }
        )

    return F.pandas_udf(fn, "struct<label:string,final:double>")


_OUT_COLS = [
    "conv_id", "label", "strategy", "value",
    "turn_idx", "line_no", "tok_start", "ngram_size", "score",
]
_OUT_SCHEMA = (
    "conv_id string, label string, strategy string, value string, "
    "turn_idx int, line_no int, tok_start int, ngram_size int, score double"
)


def hybrid_annotate(
    transcripts: DataFrame,
    labels: list[str] | None = None,
    critical: list[str] | None = None,
    dedup: bool = True,
    materialize: str = "none",
    max_broadcast_decisions: int = 2_000_000,
    staging_dir: str | None = None,
) -> DataFrame:
    """(conv_id, label, strategy, value, turn_idx, line_no, tok_start,
    ngram_size, score). With dedup=True, one highest-confidence row per
    (conv_id, label). See the module docstring for `materialize` and the
    bounded broadcast gate; the decision pass runs eagerly at call time."""
    labels = labels if labels is not None else DEFAULT_TARGET_LABELS
    critical = critical if critical is not None else DEFAULT_CRITICAL
    spark = transcripts.sparkSession
    if not labels:
        return spark.createDataFrame([], _OUT_SCHEMA)
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
        [(r[0], r[1]) for r in label_rows], "label string, norm_label string"
    )

    candidates = _ngram_candidates(transcripts).filter(F.col("norm") != "")
    if materialize == "persist":
        normed = candidates.persist(StorageLevel.MEMORY_AND_DISK)
    elif materialize == "staging":
        # The staging write happens on EXECUTORS, so a driver-local
        # tempdir only works in local mode — on a cluster the caller must
        # hand us a shared path (HDFS/S3/checkpoint volume). A caller-
        # provided staging_dir is caller-owned (no cleanup here, the
        # returned DataFrame reads it lazily); the local-mode default is
        # reaped at process exit.
        if staging_dir is not None:
            path = staging_dir
        elif spark.sparkContext.master.startswith("local"):
            import atexit
            import shutil
            import tempfile

            path = tempfile.mkdtemp(prefix="hybrid_cand_")
            atexit.register(shutil.rmtree, path, ignore_errors=True)
        else:
            raise ValueError(
                "materialize='staging' on a non-local master requires an "
                "explicit staging_dir reachable by every executor (a "
                "driver-local tempdir is not)"
            )
        candidates.write.mode("overwrite").parquet(path)
        normed = spark.read.parquet(path)
    else:  # "none": narrow recompute at join-back, nothing outlives the call
        normed = candidates

    decisions = decision_plan(normed, label_rows, label_df)
    # Bounded eager gate (ADVICE r4): decisions scale with the matched
    # VOCABULARY, which is tiny in every realistic corpus — but "always
    # tiny" is not a safety argument at 100 TB, so the gate counts before
    # collecting. The count runs over an eager localCheckpoint of the
    # decision table rather than a limit(N+1).collect(): executeTake's
    # incremental partition ramp-up (1, 4, 16, ... of
    # spark.sql.limit.scaleUpFactor) re-runs the post-shuffle stage —
    # including the Arrow embedding scorer — several times over when the
    # decisions never reach the bound, which is the common case. The
    # checkpoint materializes the decisions exactly once as local RDD
    # blocks (a persist-based gate measured slower: the InMemoryRelation
    # columnar round-trip costs more than it saves); count and collect
    # then read the blocks for free, and the over-bound fallback joins
    # against the same materialization instead of recomputing the
    # decision pass (bounded by the matched vocabulary; a 100 TB
    # deployment stages this table to storage).
    dec_c = decisions.localCheckpoint()
    n_dec = dec_c.count()
    if n_dec <= max_broadcast_decisions:
        head = dec_c.collect()
        dec_local = spark.createDataFrame(
            head, "norm string, label string, strategy string, score double"
        )
        out = normed.join(F.broadcast(dec_local), "norm")
        LAST_CALL_INFO["join"] = "broadcast-local"
        LAST_CALL_INFO["n_decisions"] = len(head)
    else:
        out = normed.join(dec_c, "norm")
        LAST_CALL_INFO["join"] = "shuffle"
        LAST_CALL_INFO["n_decisions"] = n_dec
    out = out.select(*_CAND_KEY, "value", "label", "strategy", "score")
    if not dedup:
        return out.select(*_OUT_COLS)
    wd = Window.partitionBy("conv_id", "label").orderBy(
        F.desc("score"), "turn_idx", "line_no", "tok_start", "ngram_size"
    )
    return (
        out.withColumn("d_rn", F.row_number().over(wd))
        .filter(F.col("d_rn") == 1)
        .select(*_OUT_COLS)
    )


def decision_plan(
    normed: DataFrame, label_rows: list[tuple], label_df: DataFrame
) -> DataFrame:
    """Lazy per-DISTINCT-norm decision table (norm, label, strategy,
    score): the fuzzy channel then the Arrow-batched embedding channel.
    The match decision is a pure function of the NORMALIZED text, so each
    distinct norm is scored once and joined back — the corpus has orders
    of magnitude more candidate occurrences than distinct n-grams
    (dictionary-matching shape; measured 10x+ at sf0.1)."""
    dn = normed.select("norm").distinct()

    # --- fuzzy channel. Length gate, twice:
    # (1) plan-time: sim = 1 - lev/max <= 1 - |la-lb|/max, so ONLY norms
    #     with len in [T*min_label_len, max_label_len/T] can reach the
    #     threshold against ANY label — the rest skip the crossjoin;
    # (2) per-pair: within the window, a pair whose length gap alone puts
    #     it under FUZZY_THRESHOLD skips the O(len^2) levenshtein and pins
    #     its score to 0.0 (output-equivalent: sub-threshold fuzzy values
    #     are discarded wholesale downstream).
    lens = [len(r[1]) for r in label_rows] or [0]
    lo, hi = FUZZY_THRESHOLD * min(lens), max(lens) / FUZZY_THRESHOLD
    ln = F.length("norm")
    in_win = dn.filter((ln >= lo) & (ln <= hi))
    out_win = dn.filter((ln < lo) | (ln > hi))
    mx = F.greatest(F.length("norm"), F.length("norm_label"), F.lit(1))
    gap = F.abs(F.length("norm") - F.length("norm_label"))
    fuzzy = F.when(
        gap <= (1.0 - FUZZY_THRESHOLD) * mx,
        F.lit(1.0) - F.levenshtein("norm", "norm_label") / mx,
    ).otherwise(F.lit(0.0))
    fz = in_win.crossJoin(F.broadcast(label_df)).select(
        "norm", "label", fuzzy.alias("fuzzy")
    )
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

    # --- embedding channel: norms the fuzzy channel did not claim (the
    # sub-threshold window norms plus everything outside the window),
    # scored by the vectorized Arrow stage
    emb_norms = (
        f_agg.filter(F.col("f_best") < FUZZY_THRESHOLD)
        .select("norm")
        .unionByName(out_win)
    )
    d = _embed_score_udf(label_rows)(F.col("norm"))
    emb_best = (
        emb_norms.select("norm", d.alias("d"))
        .filter(F.col("d.label").isNotNull())
        .select(
            "norm",
            F.col("d.label").alias("label"),
            F.lit("embedding-softmax").alias("strategy"),
            F.round("d.final", 6).alias("score"),
        )
    )

    return fuzzy_direct.unionByName(emb_best)
