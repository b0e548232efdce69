"""spark-submit entry point for the training-data curation funnel: the
composed corpus-hygiene pass a pretraining run executes over an extracted
document table before tokenization.

Stages (each individually oracle-verified as a registry query; this job
is their production composition — one declarative plan per stage, staged
through parquet so every stage is resumable/inspectable):

  1. composition sampling             (stratified_sample, or
                                       temperature_mixture_sample
                                       under --mix-alpha)
  2. benchmark decontamination        (contamination_flag, static shingle set)
  3. cross-corpus line dedup          (line_dedup semantics on documents)
  4. exact-substring duplicate cut    (cut_duplicate_spans)
  5. PII scrub                        (scrub_pii)
  6. per-source composition caps      (per_source_cap)
  7. per-source token budgets         (token_budget_sample)
  7b. held-out split assignment       (hash_split under --holdout; the
                                       curated table records the split,
                                       only train rows are packed)
  8. training-sequence packing        (pack_sequences)

Cluster usage (north rule packaging):
    python tools/build_pyfiles.py
    spark-submit --py-files dist/marie_ai_spark.zip jobs/curate_job.py \
        --input s3://bucket/documents --bench s3://bucket/eval_docs \
        --output s3://bucket/curated

Prints one JSON line of per-stage row/token counts on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet: "
                    "(doc_id, text, lang, source, ...)")
    ap.add_argument("--bench", default=None,
                    help="benchmark/eval docs parquet (doc_id, text); "
                    "default: the doc_id %% 50 == 0 slice of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--source-cap", type=int, default=100_000)
    ap.add_argument("--token-budget", type=int, default=10**9,
                    help="per-source token budget (uniform default)")
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument("--mix-alpha", type=float, default=None,
                    help="temperature mixture sampling exponent "
                    "(p_s ~ n_s^alpha over lang); default: keep-all "
                    "stratified sampling")
    ap.add_argument("--holdout", default=None,
                    help="held-out split fractions, e.g. 'val=0.01,"
                         "test=0.01' (train takes the remainder); the "
                         "curated table gains a 'split' column and only "
                         "train rows are packed")
    ap.add_argument("--holdout-salt", default="",
                    help="salt for the split hash (re-rolls every "
                         "assignment without touching the data)")
    ap.add_argument("--mix-frac", type=float, default=0.5,
                    help="expected kept fraction under --mix-alpha")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from marie_ai_spark.functions import token_count
    from marie_ai_spark.operators.curation import (
        benchmark_shingles,
        contamination_flag,
        per_source_cap,
        scrub_pii,
        stratified_sample,
        temperature_mixture_sample,
        token_budget_sample,
    )
    from marie_ai_spark.operators.dedup import cut_duplicate_spans, line_dedup
    from marie_ai_spark.operators.split import hash_split
    from marie_ai_spark.operators.tokenize import pack_sequences

    spark = SparkSession.builder.appName("marie-curate").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    t0 = time.perf_counter()
    docs = spark.read.parquet(args.input)
    counts = {"input": docs.count()}

    # 1. composition sampling: temperature mixture (rates derived from
    # the lang histogram) when --mix-alpha is set, else keep-all
    # stratified sampling with explicit fractions; deterministic md5
    # keep-set either way
    if args.mix_alpha is not None:
        sampled = temperature_mixture_sample(
            docs, source_col="lang", key_col="doc_id",
            alpha=args.mix_alpha, target_frac=args.mix_frac,
        ).drop("accept_rate")
    else:
        langs = [r.lang for r in docs.select("lang").distinct().collect()]
        sampled = stratified_sample(
            docs, "lang", {lg: 1.0 for lg in langs}, "doc_id"
        )

    # 2. decontamination against the benchmark slice
    if args.bench:
        bench = spark.read.parquet(args.bench).select(
            F.col("doc_id").alias("bench_id"), "text"
        )
    else:
        bench = docs.filter(F.col("doc_id") % 50 == 0).select(
            F.col("doc_id").alias("bench_id"), "text"
        )
        sampled = sampled.filter(F.col("doc_id") % 50 != 0)
    shingles = benchmark_shingles(bench, n=args.ngram)
    clean = (
        contamination_flag(sampled, shingles, n=args.ngram)
        .filter(~F.col("contaminated"))
        .drop("contaminated")
    )
    clean.write.mode("overwrite").parquet(f"{args.output}/decontaminated")
    clean = spark.read.parquet(f"{args.output}/decontaminated")
    counts["decontaminated"] = clean.count()

    # 3. + 4. duplicate text removal: corpus-frequent lines, then exact
    # duplicated substrings (canonical occurrence survives)
    lined = line_dedup(
        clean, min_convs=5, id_col="doc_id", ord_col="lang",
        text_col="text",
    ).withColumnRenamed("clean_text", "text")
    cut = cut_duplicate_spans(lined, n=20, text_col="text")
    rest = clean.select("doc_id", "lang", "source")
    dedup_docs = cut.withColumnRenamed("clean_text", "text").join(
        rest, "doc_id"
    )
    dedup_docs.write.mode("overwrite").parquet(f"{args.output}/deduped")
    dedup_docs = spark.read.parquet(f"{args.output}/deduped")
    counts["dedup_tokens_removed"] = int(
        dedup_docs.agg(F.sum("n_removed")).first()[0] or 0
    )

    # 5. PII scrub
    scrubbed = scrub_pii(dedup_docs).join(
        dedup_docs.select("doc_id", "lang", "source"), "doc_id"
    ).withColumnRenamed("clean_text", "text")
    counts["pii_hits"] = int(scrubbed.agg(F.sum("n_pii")).first()[0] or 0)

    # 6. + 7. composition: per-source caps, then token budgets
    capped = per_source_cap(
        scrubbed.select("doc_id", "text", "lang", "source"),
        "source", cap=args.source_cap, key_col="doc_id",
    )
    with_tok = capped.withColumn(
        "n_tok", token_count("text").cast("int")
    )
    budgeted = token_budget_sample(
        with_tok, "source", {}, "doc_id", "n_tok",
        default_budget=args.token_budget,
    )

    # 7b. held-out split: deterministic md5-bucket assignment recorded
    # in the curated table; train = remainder of the named fractions
    if args.holdout:
        held = {}
        for part in args.holdout.split(","):
            name, frac = part.split("=")
            name, frac = name.strip(), float(frac)
            if name == "train":
                raise SystemExit(
                    "--holdout names the held-out fractions only; 'train' "
                    "is reserved (it is derived as the remainder)"
                )
            if not 0.0 < frac < 1.0:
                raise SystemExit(
                    f"--holdout fraction {name}={frac} must be in (0, 1)"
                )
            held[name] = frac
        if sum(held.values()) >= 1.0:
            raise SystemExit(
                f"--holdout fractions sum to {sum(held.values())}; must be "
                "< 1 so a train remainder exists"
            )
        fracs = {"train": round(1.0 - sum(held.values()), 9), **held}
        budgeted = hash_split(
            budgeted, "doc_id", fracs, salt=args.holdout_salt
        )
    budgeted.write.mode("overwrite").parquet(f"{args.output}/curated")
    budgeted = spark.read.parquet(f"{args.output}/curated")
    counts["curated"] = budgeted.count()
    counts["curated_tokens"] = int(
        budgeted.agg(F.sum("n_tok")).first()[0] or 0
    )
    to_pack = budgeted
    if args.holdout:
        counts["split_counts"] = {
            r["split"]: r["n"]
            for r in budgeted.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # eval splits are held out as documents; only train is packed
        to_pack = budgeted.filter(F.col("split") == "train")

    # 8. packing manifest
    packed = pack_sequences(to_pack, "doc_id", "n_tok", args.seq_len)
    packed.write.mode("overwrite").parquet(f"{args.output}/packed")
    packed = spark.read.parquet(f"{args.output}/packed")
    counts["packed_spans"] = packed.count()
    counts["sequences"] = int(
        packed.agg(F.count_distinct("seq_id")).first()[0]
    )
    counts["elapsed_sec"] = round(time.perf_counter() - t0, 1)
    json.dump(counts, sys.stdout)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
