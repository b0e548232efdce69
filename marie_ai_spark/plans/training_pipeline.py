"""End-to-end training-data pipeline: transcripts -> deduplicated,
quality-filtered, tokenized chunks.

This is the composition the engine exists for at 100 TB: every stage is a
documented operator with its own tests; the composition adds only
filtering joins.

  1. extract         mapInPandas, shuffle-free        (operators/extract)
  2. quality gate    JVM column predicates            (operators/textstats)
  3. exact dedup     fingerprint keep-min anti-join   (operators/dedup)
  4. near dedup      MinHash-LSH candidates -> verified Jaccard -> drop
                     the higher doc of each dup pair  (operators/dedup)
  5. tokenize+chunk  mapInPandas + JVM slice fan-out  (operators/tokenize)

Shuffle budget: one exchange per dedup join + the final chunk fan-out is
narrow. The dedup keys (fingerprint / band signature) are high-cardinality
and md5-uniform — no skew. Quality thresholds are deliberately loose
defaults; they are job parameters in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import stable_fingerprint
from ..operators import dedup
from ..operators.extract import extract_transcripts
from ..operators.tokenize import chunk_tokens, tokenize_extracted
from ..ref_ops import DEFAULT_RULES


def build_training_set(
    transcripts: DataFrame,
    rules=DEFAULT_RULES,
    min_chars: int = 20,
    max_stop_ratio: float = 0.60,
    jaccard_threshold: float = 0.8,
    max_len: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """transcripts -> (conv_id, turn_idx, chunk_idx, chunk, chunk_len)."""
    extracted = extract_transcripts(transcripts, rules)

    # 2. quality gate — pure column predicates, evaluated before any shuffle
    toks = F.split(F.trim("clean_text"), r"\s+")
    n_tok = F.when(F.trim(F.col("clean_text")) == "", 0).otherwise(F.size(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin("the", "a")))
    quality = extracted.filter(
        (F.length("clean_text") >= min_chars)
        & (n_tok > 0)
        & (n_stop / n_tok <= max_stop_ratio)
    )

    # 3. exact dedup: keep the smallest (conv_id, turn_idx) per fingerprint
    fp = quality.withColumn("fp", stable_fingerprint("clean_text"))
    keeper = fp.groupBy("fp").agg(
        F.min(F.struct("conv_id", "turn_idx")).alias("k")
    )
    uniq = (
        fp.join(keeper, "fp")
        .filter(
            (F.col("conv_id") == F.col("k.conv_id"))
            & (F.col("turn_idx") == F.col("k.turn_idx"))
        )
        .drop("fp", "k")
    )

    # 4. near dedup on the survivors: MinHash-LSH candidate pairs, exact
    #    Jaccard verification ONLY on those pairs, then drop the
    #    lexicographically larger member of each dup pair. Verification
    #    volume is O(candidates x shingles-per-doc), never the all-shared-
    #    shingle-pairs blowup a direct Jaccard self-join would produce.
    # cache barrier: `docs` feeds FOUR downstream subtrees (LSH candidates,
    # two sides of the verification shingle join, and the survivor
    # anti-join). Without it, Catalyst recomputes the whole
    # extract->quality->exact-dedup upstream — including the pandas-UDF
    # extraction — once per consumer (~6 extraction passes, measured 3x
    # slower). The cached relation is the quality-filtered DEDUPED clean
    # text, far smaller than the raw corpus; at 100 TB this stage is a
    # written staging table between pipeline phases, not an in-memory cache.
    docs = uniq.select(
        F.concat_ws("\x1f", "conv_id", F.col("turn_idx")).alias("doc_id"),
        F.col("clean_text").alias("text"),
    ).cache()
    candidates = dedup.minhash_lsh_candidates(docs, n=3)
    near = dedup.verify_jaccard_pairs(docs, candidates, n=3).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    losers = near.select(F.col("doc_b").alias("doc_id")).distinct()
    # survivors already carry everything tokenization needs — no second
    # pass over the extraction subtree
    kept = docs.join(losers, "doc_id", "left_anti").select(
        F.split_part("doc_id", F.lit("\x1f"), F.lit(1)).alias("conv_id"),
        F.split_part("doc_id", F.lit("\x1f"), F.lit(2))
        .cast("int")
        .alias("turn_idx"),
        F.col("text").alias("clean_text"),
    )

    # 5. tokenize + chunk
    return chunk_tokens(tokenize_extracted(kept), max_len, overlap)


def training_set_stats(chunks: DataFrame) -> DataFrame:
    """One-row corpus summary for the lineage/metrics record."""
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("conv_id", "turn_idx").alias("n_docs"),
        F.sum("chunk_len").alias("n_tokens"),
        F.round(F.avg("chunk_len"), 2).alias("avg_chunk_len"),
    )
