"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, fingerprinting, language profiling.

All pure JVM-side column expressions (whole-stage codegen, no Python) — at
100 TB these run at scan speed with full predicate pushdown. Semantics
mirror the reference's text handling where one exists (stringify/strip:
marie/ocr/util.py:92-95; content checksum: marie/utils/image_utils.py:136-149)
and standard web-scale quality heuristics otherwise.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import spread_input, stable_fingerprint, token_count, tokens

STOPWORDS = ("the", "a")


def with_token_count(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Length / stopword-ratio / mean-token-length quality features, rounded
    to fixed decimals so engine and oracle hash identically."""
    toks = tokens("text")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    total_tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(
            F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_tok > 0, total_tok_chars.cast("double") / n_tok).otherwise(0.0),
            4,
        ).alias("mean_token_len"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", stable_fingerprint("text").alias("fingerprint")
    )


def language_profile(documents: DataFrame) -> DataFrame:
    """Per-language corpus rollup (count + mean doc length)."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
        )
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher/C4-style repetition quality signals, fully relational:

      dup_line_frac       fraction of lines that are repeats of an earlier
                          identical line (count - distinct) / count
      dup_line_char_frac  character mass of those repeated lines / total
      top_bigram_frac     share of the most frequent word bigram among all
                          bigram occurrences

    High values mark boilerplate/template spam for the training-data
    filter. One explode per signal family, map-side-combinable aggregates;
    ratios are emitted as decimals so the oracle hashes exactly.
    """
    docs_sp = spread_input(documents, "doc_id")
    lines = docs_sp.select(
        "doc_id", F.explode(F.split("text", "\n")).alias("line")
    ).filter(F.trim("line") != "")
    per_line = lines.groupBy("doc_id", "line").agg(
        F.count(F.lit(1)).alias("c"), F.length("line").alias("len")
    )
    # ratios of exact integers: double division is bit-identical across
    # engines and round(.,6) can never land on a half-way boundary (5e-7
    # is not binary-representable), so the hash gate is safe without
    # decimal-division scale gymnastics
    line_stats = per_line.groupBy("doc_id").agg(
        F.round(
            (F.sum("c") - F.count(F.lit(1))) / F.sum("c"), 6
        ).alias("dup_line_frac"),
        F.round(
            F.sum((F.col("c") - 1) * F.col("len"))
            / F.sum(F.col("c") * F.col("len")),
            6,
        ).alias("dup_line_char_frac"),
    )

    toks = docs_sp.select("doc_id", tokens("text").alias("w"))
    bigrams = toks.filter(F.size("w") >= 2).select(
        "doc_id", F.explode(shingles_of_tokens_n2("w")).alias("bg")
    )
    per_bg = bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    bg_stats = per_bg.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )
    return (
        documents.select("doc_id")
        .join(line_stats, "doc_id", "left")
        .join(bg_stats, "doc_id", "left")
    )


def shingles_of_tokens_n2(wcol):
    """NON-distinct word bigrams of a token-array column (repetition
    counting needs every occurrence, unlike the dedup shingles)."""
    w = F.col(wcol) if isinstance(wcol, str) else wcol
    return F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 2),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _with_tri(df: DataFrame) -> DataFrame:
    """Char-trigram column over the normalized text `t`, as a VECTORIZED
    Arrow batch (python slicing is O(1) per window). The previous all-JVM
    form — transform(sequence(...), i -> substring(t, i, 3)) — was
    measured ~10x slower: substring on UTF8String walks from the string
    start (multi-byte aware), so the per-position HOF is O(len^2) PER
    DOCUMENT no matter how the input is materialized. Trigram content is
    identical (both slice by characters)."""
    @F.pandas_udf("array<string>")
    def tri(t: pd.Series) -> pd.Series:
        return t.map(lambda s: [s[i : i + 3] for i in range(len(s) - 2)])

    return df.withColumn("tri", tri("t"))


def _norm_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, lang, t): whitespace-collapsed lowercase text, >= 3 chars.
    spread_input: every consumer is a CPU-heavy trigram stage, and a
    small corpus scans as one task (guide §2.5)."""
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return spread_input(documents, "doc_id").select(
        "doc_id", F.col("lang"), norm.alias("t")
    ).filter(F.length("t") >= 3)


def _tri_counts(norm: DataFrame) -> DataFrame:
    """Partially-aggregated per-(lang, trigram) occurrence counts as ONE
    Arrow stage: each batch emits its local Counter as (lang, g, c) rows.
    Replaces the _with_tri array + JVM explode on the PROFILE side of the
    lang-ID / fluency trainers — shipping every trigram occurrence back
    through Arrow (~300 strings per document) cost more than the whole
    downstream aggregation; the per-batch Counter ships only the batch's
    distinct (lang, trigram) vocabulary, which the JVM then sums. Counts
    are exact integers, so the summed profile is identical to the
    explode+count form regardless of batch boundaries."""
    def fn(batches):
        from collections import Counter

        for pdf in batches:
            acc: dict = {}
            for lang, t in zip(pdf["lang"], pdf["t"]):
                c = acc.get(lang)
                if c is None:
                    c = acc[lang] = Counter()
                c.update(t[i: i + 3] for i in range(len(t) - 2))
            if acc:
                langs, gs, cs = [], [], []
                for lang, c in acc.items():
                    for g, n in c.items():
                        langs.append(lang)
                        gs.append(g)
                        cs.append(n)
                yield pd.DataFrame({"lang": langs, "g": gs, "c": cs})

    return norm.select("lang", "t").mapInPandas(
        fn, "lang string, g string, c long"
    )


def _lang_classify(grams: DataFrame, profile: DataFrame, top_k: int) -> DataFrame:
    """Classification against a given profile table: ZERO profile
    aggregation in this plan (tests/test_plan_shapes.py pins it) — the
    doc side's array_distinct is shuffle-free and the profile join is an
    explicit broadcast."""
    doc_grams = grams.select(
        "doc_id", "lang", F.explode(F.array_distinct("tri")).alias("g")
    )
    scored = (
        doc_grams.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "p_lang")
        .agg(
            F.sum(F.lit(top_k + 1) - F.col("rank")).cast("bigint").alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("p_lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("actual_lang"),
            F.col("p_lang").alias("predicted_lang"),
            "score",
        )
    )


def lang_profile_table(documents: DataFrame, top_k: int = 50) -> DataFrame:
    """TRAIN once: the persistable language-trigram profile (p_lang, g,
    rank). The 100-TB shape is write-this-table-then-classify; the fused
    lang_id_ngram exists for oracle parity and small corpora. Counting
    runs through the partially-aggregated Arrow stage (_tri_counts) —
    same exact-integer counts as the explode form, a fraction of the
    Arrow transfer."""
    counts = (
        _tri_counts(_norm_docs(documents))
        .groupBy("lang", "g")
        .agg(F.sum("c").alias("cnt"))
    )
    return (
        counts.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("g"))
            ),
        )
        .filter(F.col("rank") <= top_k)
        .select(F.col("lang").alias("p_lang"), "g", "rank")
    )


def lang_id_classify(
    documents: DataFrame, profile: DataFrame, top_k: int = 50
) -> DataFrame:
    """APPLY only: classify documents against a pretrained profile table —
    no profile aggregation anywhere in this plan."""
    return _lang_classify(
        _with_tri(_norm_docs(documents)), profile, top_k
    )


def lang_id_ngram(documents: DataFrame, top_k: int = 50) -> DataFrame:
    """Language identification by character-trigram profiles, model-free
    and relational except the vectorized Arrow trigram stage: train
    (top_k trigrams per language by count desc, trigram asc) fused with
    classify (distinct doc trigrams join the broadcast profile; score =
    sum(top_k + 1 - rank); argmax with lang-asc tie-break).

    On real multilingual text this is the classic n-gram LID heuristic; on
    the synthetic corpus (shared vocabulary across langs) it demonstrates
    the mechanics and scores near chance by construction.

    Execution (round 8): the trained profile is collected — top_k rows per
    language, the same bounded model-state collect the BM25/IVF trainers
    make — and the apply side runs the dictionary-pattern stateless UDF
    (lang_id_classify_stream), which is row-equal to the relational
    lang_id_classify by test (integer scores, identical tie-breaks,
    identical no-hit exclusion). That removes the classify side's second
    trigram pass + explode + profile join + score aggregation + argmax
    window from the plan; the relational classify remains the tested
    reference (test_split_forms_equal_fused compares the two end to end).

    No session-lifetime cache: the profile pass runs once (its rows are
    the model state); NOTE (round 2): deriving both sides from a shared
    per-(doc, trigram) count relation was tried and REVERTED — measured
    3x slower at sf0.1 (the shared shuffle compresses worse).
    """
    rows = [r.asDict() for r in lang_profile_table(documents, top_k).collect()]
    return lang_id_classify_stream(
        spread_input(documents, "doc_id"), rows, top_k
    )


def fluency_scores(documents: DataFrame, top_k: int = 200) -> DataFrame:
    """CCNet-style fluency proxy, fully relational and hash-portable: the
    fraction of a document's char-trigram OCCURRENCES covered by its own
    language's top_k corpus profile. A low coverage marks gibberish /
    wrong-language / template noise the same way an LM perplexity filter
    does, without a model — and the score is a ratio of EXACT integers,
    so round(.,6) hashes identically on every engine (no float-sum order
    sensitivity; same discipline as repetition_stats).

    Execution mirrors lang_id_ngram (round 8): the trained profile —
    top_k trigrams per language, bounded model state — is collected and
    the apply side runs the stateless dictionary UDF
    (fluency_classify_stream), bit-equal to the relational
    fluency_classify by test (exact integer numerators/denominators
    computed in Python, the fraction + HALF_UP rounding stay JVM-side).
    The relational classify remains the tested reference
    (test_split_forms_equal_fused).

    Output: (doc_id, lang, n_trigrams bigint, in_profile_frac).
    """
    rows = [
        r.asDict() for r in fluency_profile_table(documents, top_k).collect()
    ]
    return fluency_classify_stream(spread_input(documents, "doc_id"), rows)


def fluency_profile_table(documents: DataFrame, top_k: int = 200) -> DataFrame:
    """TRAIN once: the persistable (lang, pg) fluency profile — the top_k
    char trigrams per language (count desc, trigram asc). Counting runs
    through the partially-aggregated Arrow stage (_tri_counts); identical
    exact-integer counts, a fraction of the Arrow transfer."""
    counts = (
        _tri_counts(_norm_docs(documents))
        .groupBy("lang", "g")
        .agg(F.sum("c").alias("cnt"))
    )
    return (
        counts.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("g"))
            ),
        )
        .filter(F.col("rank") <= top_k)
        .select("lang", F.col("g").alias("pg"))
    )


def fluency_classify(documents: DataFrame, profile: DataFrame) -> DataFrame:
    """APPLY only: coverage of each doc's trigram occurrences by a
    pretrained profile — zero profile aggregation, zero window functions
    in this plan (tests/test_plan_shapes.py pins it)."""
    return _fluency_classify(
        documents, _with_tri(_norm_docs(documents)), profile
    )


def _fluency_classify(
    documents: DataFrame, grams: DataFrame, profile: DataFrame
) -> DataFrame:
    occ = (
        grams.select("doc_id", "lang", F.explode("tri").alias("g"))
        .groupBy("doc_id", "lang", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    j = occ.join(
        F.broadcast(profile),
        (occ.lang == profile.lang) & (occ.g == profile.pg),
        "left_outer",
    ).select(occ.doc_id, occ.lang, occ.c, profile.pg)
    stats = j.groupBy("doc_id", "lang").agg(
        F.sum("c").cast("bigint").alias("n_trigrams"),
        F.round(
            F.sum(F.when(F.col("pg").isNotNull(), F.col("c")).otherwise(0))
            / F.sum("c"),
            6,
        ).alias("in_profile_frac"),
    )
    # short/empty docs (< 3 normalized chars) carry zero trigrams
    return (
        documents.select("doc_id", "lang")
        .join(stats, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_trigrams", F.lit(0)).cast("bigint").alias("n_trigrams"),
            F.coalesce("in_profile_frac", F.lit(0.0)).alias("in_profile_frac"),
        )
    )


def lang_id_classify_stream(
    documents: DataFrame, profile_rows: list, top_k: int = 50
) -> DataFrame:
    """Streaming APPLY for the pretrained language-ID model. The
    relational classify's argmax window cannot run on an unbounded
    stream, so the profile — tiny persisted model state, (p_lang, g,
    rank) rows — is pinned per executor inside a STATELESS scalar pandas
    UDF (the dictionary pattern) and each document scores locally.
    Scoring is the same exact-integer sum as _lang_classify, the
    normalization mirrors the JVM expression (ASCII \\s collapse +
    lower), and docs with no profile hits are excluded the same way the
    inner join excludes them — proven row-equal to lang_id_classify in
    tests, on batch AND under availableNow streaming."""
    import re as _re

    by_gram: dict = {}
    for r in profile_rows:
        by_gram.setdefault(r["g"], []).append(
            (r["p_lang"], top_k + 1 - r["rank"])
        )

    def fn(texts: pd.Series) -> pd.DataFrame:
        langs, scores = [], []
        for t in texts:
            tt = (
                _re.sub(r"\s+", " ", t, flags=_re.ASCII).lower()
                if t is not None
                else ""
            )
            acc: dict = {}
            if len(tt) >= 3:
                for g in {tt[i : i + 3] for i in range(len(tt) - 2)}:
                    for pl, wgt in by_gram.get(g, ()):
                        acc[pl] = acc.get(pl, 0) + wgt
            if not acc:
                langs.append(None)
                scores.append(None)
            else:
                pl, sc = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))
                langs.append(pl)
                scores.append(sc)
        return pd.DataFrame(
            {"predicted_lang": langs,
             "score": pd.array(scores, dtype="Int64")}
        )

    d = F.pandas_udf(fn, "struct<predicted_lang:string,score:bigint>")(
        F.col("text")
    )
    return (
        documents.select(
            "doc_id", F.col("lang").alias("actual_lang"), d.alias("d")
        )
        .filter(F.col("d.predicted_lang").isNotNull())
        .select(
            "doc_id",
            "actual_lang",
            F.col("d.predicted_lang").alias("predicted_lang"),
            F.col("d.score").alias("score"),
        )
    )


def fluency_classify_stream(
    documents: DataFrame, profile_rows: list
) -> DataFrame:
    """Streaming APPLY for the pretrained fluency profile: the (lang, pg)
    set pins per executor in a stateless scalar UDF that emits the EXACT
    INTEGER components (n_trigrams, covered); the fraction + HALF_UP
    rounding stay JVM-side as the identical expression the batch path
    evaluates, so results are bit-equal to fluency_classify (tested on
    batch and under availableNow)."""
    import re as _re

    pset = frozenset((r["lang"], r["pg"]) for r in profile_rows)

    def fn(texts: pd.Series, langs: pd.Series) -> pd.DataFrame:
        ns, covs = [], []
        for t, lg in zip(texts, langs):
            tt = (
                _re.sub(r"\s+", " ", t, flags=_re.ASCII).lower()
                if t is not None
                else ""
            )
            if len(tt) < 3:
                ns.append(0)
                covs.append(0)
                continue
            n = len(tt) - 2
            cov = sum(
                1 for i in range(n) if (lg, tt[i : i + 3]) in pset
            )
            ns.append(n)
            covs.append(cov)
        return pd.DataFrame({"n": ns, "cov": covs})

    d = F.pandas_udf(fn, "struct<n:bigint,cov:bigint>")(
        F.col("text"), F.col("lang")
    )
    return documents.select(
        "doc_id", "lang", d.alias("d")
    ).select(
        "doc_id",
        "lang",
        F.col("d.n").alias("n_trigrams"),
        # ANSI-safe zero-trigram guard: 0/0 must yield the batch path's
        # 0.0 (left-join coalesce), not a DIVIDE_BY_ZERO error
        F.when(
            F.col("d.n") > 0, F.round(F.col("d.cov") / F.col("d.n"), 6)
        ).otherwise(F.lit(0.0)).alias("in_profile_frac"),
    )


def fluency_buckets(
    documents: DataFrame, lo: float = 0.33, hi: float = 0.67
) -> DataFrame:
    """CCNet-style composition buckets: per language, documents split
    into head / middle / tail by exact interpolated percentiles of the
    fluency score (CCNet buckets by LM perplexity with head = most
    fluent; here higher profile coverage = more fluent). The per-lang
    cutoffs are a tiny aggregate broadcast back onto the scores — no
    window over the corpus. Downstream mixes typically keep head+middle
    and sample tail.

    Engine parity: Spark `percentile` == DuckDB `quantile_cont`
    (established by q_percentiles), and both sides compare the same
    rounded score against the same cutoff, so bucket boundaries agree
    exactly."""
    scores = fluency_scores(documents)
    cuts = scores.groupBy("lang").agg(
        F.expr(f"percentile(in_profile_frac, {lo})").alias("c_lo"),
        F.expr(f"percentile(in_profile_frac, {hi})").alias("c_hi"),
    )
    return (
        scores.join(F.broadcast(cuts), "lang")
        .withColumn(
            "bucket",
            F.when(F.col("in_profile_frac") >= F.col("c_hi"), "head")
            .when(F.col("in_profile_frac") >= F.col("c_lo"), "middle")
            .otherwise("tail"),
        )
        .select("doc_id", "lang", "in_profile_frac", "bucket")
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 lexical retrieval (Robertson/Sparck Jones): top-k documents
    for a bag of query terms — the keyword-side retrieval that pairs
    with the ANN embedding side for query-based corpus slicing ("find
    training docs about X"). Fully relational:

      - one narrow pass tokenizes and takes per-doc length;
      - corpus stats (N, avgdl) are a 1-row aggregate (driver metadata,
        like IVF centroids);
      - term frequencies exist ONLY for query terms (`isin` prunes the
        explode before the shuffle), so the aggregate is
        |matching docs x terms|, not corpus-wide;
      - document frequencies are a <= |terms|-row aggregate joined back
        as a broadcast;
      - the per-doc score folds term scores in TERM-ASCENDING order
        (sort_array + aggregate) so the float sum is order-deterministic
        and hashes identically on any engine.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the non-negative variant);
    score rounded to 4 decimals; ties broken by doc_id.
    """
    toks = spread_input(documents, "doc_id").select(
        "doc_id", tokens("text").alias("w")
    ).withColumn("dl", F.size("w"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs, avgdl = stats["n"], stats["avgdl"] or 1.0

    tf = (
        toks.select("doc_id", "dl", F.explode("w").alias("t"))
        .filter(F.col("t").isin(list(query_terms)))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("t").agg(
        F.count_distinct("doc_id").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl))))
    )
    per_term = tf.join(F.broadcast(df_tbl), "t").select(
        "doc_id", "t", term_score.alias("s")
    )
    folded = (
        per_term.groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("t", "s"))).alias("parts")
        )
        .select(
            "doc_id",
            F.round(
                F.aggregate(
                    F.col("parts"),
                    F.lit(0.0),
                    lambda acc, p: acc + p["s"],
                ),
                4,
            ).alias("bm25"),
        )
    )
    return folded.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)


def bm25_train_stats(
    documents: DataFrame, query_terms: list[str]
) -> dict:
    """Pin the corpus-level BM25 statistics as persistable model state —
    the train half of the train-once/apply-on-ingest split (same shape
    as lang_id_profile / fluency_profile): one 1-row aggregate for
    (N, avgdl) and one <= |terms|-row aggregate for per-term document
    frequencies. The returned dict is tiny driver metadata (JSON-able;
    persist next to the corpus like the IVF quantizer)."""
    toks = spread_input(documents, "doc_id").select(
        "doc_id", tokens("text").alias("w")
    ).withColumn("dl", F.size("w"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    df_map = {
        r["t"]: int(r["df"])
        for r in toks.select("doc_id", F.explode("w").alias("t"))
        .filter(F.col("t").isin(list(query_terms)))
        .groupBy("t")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    }
    return {
        "n_docs": int(stats["n"]),
        "avgdl": float(stats["avgdl"] or 1.0),
        "df": {t: df_map.get(t, 0) for t in query_terms},
    }


def bm25_score_stream(
    documents: DataFrame,
    stats: dict,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Streaming APPLY for BM25 retrieval: score each document against
    the pinned train-time statistics with PURE per-row column
    expressions — no corpus aggregate in the plan, so the same code runs
    on a batch DataFrame and an unbounded readStream (availableNow
    parity is test-asserted, bit-equal to bm25_topk's scores).

    Bit-equality with the batch fold: per-term scores are added in
    TERM-ASCENDING order (the batch sort_array fold order), absent terms
    contribute an exact +0.0 (float identity), idf stays a JVM ln over
    the pinned df literal (constant-folded by Catalyst — same double the
    batch path computes per row), and the rounding is the same JVM
    round-half-up. Terms with train-time df == 0 never contribute (the
    batch join drops them); a term newly appearing after training keeps
    scoring 0 until stats are re-trained — the documented staleness of
    any pinned-model apply path.

    Output: (doc_id, bm25, matched) for every input row; filter
    `matched` for the batch-identical result set."""
    terms = sorted(t for t, d in stats["df"].items() if d > 0)
    n_docs = float(stats["n_docs"])
    avgdl = float(stats["avgdl"])
    out = documents.select(
        "doc_id", tokens("text").alias("_w")
    ).withColumn("_dl", F.size("_w"))
    score = F.lit(0.0)
    n_match = F.lit(0)
    for t in terms:
        dfv = float(stats["df"][t])
        tf = F.size(F.filter("_w", lambda x: x == F.lit(t)))
        idf = F.log(
            F.lit(1.0)
            + (F.lit(n_docs) - F.lit(dfv) + 0.5) / (F.lit(dfv) + 0.5)
        )
        term_score = idf * (
            tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("_dl") / F.lit(avgdl)))
        )
        score = score + F.when(tf > 0, term_score).otherwise(F.lit(0.0))
        n_match = n_match + tf
    return out.select(
        "doc_id",
        F.round(score, 4).alias("bm25"),
        (n_match > 0).alias("matched"),
    )
