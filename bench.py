"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints exactly ONE
JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

The driver records only the LAST ~2000 chars of stdout; round 4's line
grew past that (per-query steal dict) and the recorded BENCH_r04.json
came back unparseable. The stdout line is therefore kept compact —
2-decimal timings, compact separators, a hard size guard — and the full
detail (3-decimal timings, per-query steal, end-of-run calibration) is
written to BENCH/last_run.json instead.

The extraction-pipeline queries synthesize their transcripts input
deterministically (seeded) per the north rule; relational/dedup/similarity
queries read the provided parquet tables. All Spark logs go to stderr;
stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_region_revenue",
    "q_top3_orders_per_customer",
    "q_order_priority_count",
    "q_returnflag_vote",
    "q_sessionize",
    "q_asof_signup_before_purchase",
    "q_value_range_join",
    "q_dedup_exact",
    "q_ngram_jaccard",
    "q_minhash_lsh",
    "q_simhash",
    "q_simhash_neardup",
    "q_dup_clusters",
    "q_dup_clusters_star",
    "q_token_count",
    "q_quality_score",
    "q_fingerprint",
    "q_winnow",
    "q_repetition",
    "q_lang_profile",
    "q_lang_id",
    "q_lang_id_pretrained",
    "q_embed_topk",
    "q_embed_ivf_topk",
    "q_anti_join",
    "q_semi_join",
    "q_rollup",
    "q_event_pivot",
    "q_percentiles",
    "q_running_revenue",
    "q_monthly_volume",
    "q_cheapest_supplier",
    "q_sql_nation_revenue",
    "q_annotate_regex",
    "q_fuzzy_match",
    "q_classify_vote",
    "q_embed_neardup",
    "q_extract_transcripts",
    "q_extract_grid",
    "q_extract_continuation",
    "q_conversation_rollup",
    "q_span_regions",
    "q_markdown_kv",
    "q_region_tables",
    "q_region_table_footers",
    "q_region_fields",
    "q_entity_vote",
    "q_multiline_match",
    "q_multiline_blocks",
    "q_hybrid_annotate",
    "q_vote_fallback",
    "q_validate_sections",
    "q_adlib_pages",
    "q_adlib_summary",
    "q_merge_iou",
    "q_merge_horizontal",
    "q_training_pipeline",
    "q_media_decode",
    "q_media_frames",
    "q_serialize_blobs",
    "q_section_tables",
    "q_classify_vote_diff",
    "q_decontaminate",
    "q_scrub_pii",
    "q_stratified_sample",
    "q_source_cap",
    "q_token_budget_sample",
    "q_semantic_dedup",
    "q_line_dedup",
    "q_contamination_flag",
    "q_dup_spans",
    "q_cut_dup_spans",
    "q_pack_seqs",
    "q_curation_pipeline",
    "q_fluency",
    "q_fluency_pretrained",
    "q_fluency_buckets",
    "q_bm25",
    "q_bm25_stream_scores",
    "q_ivf_upsert",
    "q_rrf",
    "q_rrf_bulk",
    "q_mix",
    "q_faithfulness",
    "q_hash_split",
    "q_split_leakage",
    "q_kmeans",
    "q_quantize_embed",
    "q_hash_project",
    "q_ann_rerank",
    "q_ann_rerank_indexed",
    "q_hamming_topk",
    "q_ann_recall",
]


def cpu_snap():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _steal_pct(a, b) -> float:
    d = [y - z for z, y in zip(a, b)]
    tot = sum(d) or 1
    return round(100 * d[7] / tot, 2)


def _cal_unit(_=None) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def _host_calibration() -> dict:
    """Fixed single-thread work unit + CPU steal over it: lets cross-round
    bench comparisons be normalized for host contention (this VM shares a
    physical box; measured steal has ranged 0.7-11% between windows, and
    identical queries have varied ~2x run-to-run on busy windows)."""
    a = cpu_snap()
    cal = _cal_unit()
    b = cpu_snap()
    return {"host_cal_sec": cal, "steal_pct": _steal_pct(a, b)}


def _parallel_calibration(workers: int = 0) -> dict:
    """The same fixed work unit on EVERY core at once. The round-6 record
    showed single-thread calibration is blind to ambient multi-core
    slowdown: the 1-thread probe matched the round-5 window while 7-12%
    steal bursts repeatedly hit only the parallel Spark stages. A fully
    parallel probe occupies the whole VM the way a shuffle stage does, so
    its per-worker median vs the 1-thread time IS the contention factor
    the queries actually ran under."""
    import multiprocessing as mp

    workers = workers or min(32, os.cpu_count() or 1)
    a = cpu_snap()
    t0 = time.perf_counter()
    with mp.get_context("fork").Pool(workers) as pool:
        worker_secs = pool.map(_cal_unit, range(workers))
    wall = round(time.perf_counter() - t0, 3)
    b = cpu_snap()
    return {
        "par_cal_workers": workers,
        "par_cal_wall_sec": wall,
        "par_cal_worker_median_sec": sorted(worker_secs)[len(worker_secs) // 2],
        "par_cal_worker_max_sec": max(worker_secs),
        "par_cal_steal_pct": _steal_pct(a, b),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cal = _host_calibration()
    par_cal = _parallel_calibration()

    import __spark_entry__ as entrymod
    from marie_ai_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)

    # warm the JVM/codegen path so the first timed query isn't charged
    # for session bring-up
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    qs = entrymod.queries()
    timings = {}
    query_steal = {}
    total = 0.0
    # SPARK_GRAFT_BENCH_REPS > 1 keeps the per-query MIN across reps —
    # for local cross-round comparisons on this weather-prone shared host
    # (the driver's recorded runs stay at the default single rep)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"))
    for name in HEADLINE:
        fn = qs[name]
        snap0 = cpu_snap()
        dt = None
        for _ in range(max(reps, 1)):
            t0 = time.perf_counter()
            # foreach-noop materializes every row without driver collect
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            d = round(time.perf_counter() - t0, 3)
            dt = d if dt is None or d < dt else dt
        # per-query steal%: attributes host-weather noise to the exact
        # queries it hit, making cross-round per-query deltas decidable
        query_steal[name] = _steal_pct(snap0, cpu_snap())
        timings[name] = dt
        total += dt
        # each query is timed self-contained: operator-internal caches
        # (lang-id profile barrier, training-pipeline staging, cluster
        # labels) must not leak GC pressure into later queries
        spark.catalog.clearCache()
    cal_end = _host_calibration()
    par_cal_end = _parallel_calibration()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass

    # full-detail record: everything that used to bloat the stdout line
    detail = {
        "metric": "total_headline_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "reps": reps,
        **cal,
        "host_cal_end_sec": cal_end["host_cal_sec"],
        "steal_end_pct": cal_end["steal_pct"],
        "par_cal_start": par_cal,
        "par_cal_end": par_cal_end,
        "query_steal": query_steal,
    }
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    try:
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "last_run.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # detail file is best-effort; the stdout line is the contract

    # stdout line: compact separators + adaptive number width keep all 83
    # queries under the driver's 2000-char capture even when bad host
    # weather pushes many timings to double digits (sub-10s queries print
    # 1 decimal, >=10s print whole seconds; 3-decimal timings, host
    # calibration and per-query steal live in BENCH/last_run.json); if the
    # registry outgrows the window anyway, the guard sheds the CHEAPEST
    # timings one at a time (least informative for cross-round per-query
    # comparison) and reports how many were omitted, instead of dropping
    # the whole dict
    def _compact(v):
        return int(round(v)) if v >= 10 else round(v, 1)

    summary = {
        "metric": "total_sec",
        "value": round(total, 1),
        # legacy alias: rounds 1-5 keyed this stdout line on
        # 'total_headline_runtime'; emit both so old parsers keep matching
        "total_headline_runtime": round(total, 1),
        "unit": "sec",
        "queries": {k: _compact(v) for k, v in timings.items()},
        "sf": sf,
    }
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1975:  # line + newline must fit the 2000-char capture
        by_cost = sorted(timings, key=timings.get)
        omitted = 0
        while len(line) > 1960 and by_cost:  # leave room for the counter
            summary["queries"].pop(by_cost.pop(0), None)
            omitted += 1
            summary["queries_omitted"] = omitted
            line = json.dumps(summary, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
