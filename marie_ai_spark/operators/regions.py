"""Structured regions: the normalized relational form of the reference's
StructuredRegion tree.

The reference carries extraction results as nested Section/Block objects
with page/line provenance (marie/extract/structures/structured_region.py:
15-283; assembled by the region-processor visitor,
marie/extract/engine/match_section_region_processor_visitor.py). The Spark
data model normalizes that tree into side tables keyed by
(conv_id, turn_idx, region_id) — SURVEY.md §1.1.

KV parsing (the `_process_region_as_kv` role route,
match_section_extract_visitor.py:439) is done here for the markdown
bold-key bullet form entirely JVM-side with regexp_extract_all — the
simple structured case doesn't need Python at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KV_PAIR = r"(?m)^-\s+\*\*(.+?)\*\*\s*:?\s*(.*)$"


def span_regions(extracted: DataFrame) -> DataFrame:
    """Explode per-turn spans into the normalized regions table:
    (conv_id, turn_idx, region_id, start, end, label, action)."""
    return extracted.select(
        "conv_id",
        "turn_idx",
        F.posexplode("spans").alias("region_id", "s"),
    ).select(
        "conv_id",
        "turn_idx",
        "region_id",
        F.col("s.start").alias("start"),
        F.col("s.end").alias("end"),
        F.col("s.label").alias("label"),
        F.col("s.action").alias("action"),
    )


def markdown_kv_pairs(transcripts: DataFrame) -> DataFrame:
    """Bold-key bullet KV rows from markdown turns, JVM-side:
    (conv_id, turn_idx, kv_idx, key, value)."""
    md = transcripts.filter(
        F.col("text").rlike(r"(?m)^-\s+\*\*")
    )
    keys = F.regexp_extract_all(F.col("text"), F.lit(_KV_PAIR), 1)
    vals = F.regexp_extract_all(F.col("text"), F.lit(_KV_PAIR), 2)
    pairs = F.zip_with(
        keys,
        vals,
        lambda k, v: F.struct(
            F.regexp_replace(F.trim(k), ":$", "").alias("key"),
            F.trim(v).alias("value"),
        ),
    )
    return md.select(
        "conv_id",
        "turn_idx",
        F.posexplode(pairs).alias("kv_idx", "p"),
    ).select(
        "conv_id",
        "turn_idx",
        "kv_idx",
        F.col("p.key").alias("key"),
        F.col("p.value").alias("value"),
    )


def region_role_counts(extracted: DataFrame) -> DataFrame:
    """regions_by_role analog (unstructured_document.py:241-302): per-label
    region counts and kept-char volume across the corpus."""
    return (
        span_regions(extracted)
        .groupBy("label", "action")
        .agg(
            F.count(F.lit(1)).alias("n_regions"),
            F.sum(F.col("end") - F.col("start")).alias("n_chars"),
        )
    )
