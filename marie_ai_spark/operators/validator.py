"""E3 candidate validation as a relational operator.

The reference's fix_mismatched_sections DFA
(marie/extract/engine/candidate_validator.py:66-187) collapses to a single
lead() window: after each marker the DFA state equals that marker's own
kind, so a VALID transition exists exactly when the PREVIOUS marker is a
START — i.e. every START closes at the next marker of any kind, or at
end-of-context. (ref_ops/validator.py carries the literal DFA walk; the
property test in tests/test_validator.py pins the equivalence on random
marker sequences.)

One exchange on (conv_id, turn_idx); everything else is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START_EXPR = r"^BEGIN BOILERPLATE$"
STOP_EXPR = r"^END BOILERPLATE$"


def cutpoint_markers(
    transcripts: DataFrame,
    start_expr: str = START_EXPR,
    stop_expr: str = STOP_EXPR,
) -> DataFrame:
    """(conv_id, turn_idx, pos, kind, n_lines): START/STOP marker lines plus
    the turn's line count (the end-of-context position)."""
    lines = transcripts.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split("text", "\n")).alias("pos", "line"),
    )
    wt = Window.partitionBy("conv_id", "turn_idx")
    kind = (
        F.when(F.col("line").rlike(start_expr), "START")
        .when(F.col("line").rlike(stop_expr), "STOP")
    )
    return (
        lines.withColumn("n_lines", F.count(F.lit(1)).over(wt))
        .withColumn("kind", kind)
        .filter(F.col("kind").isNotNull())
        .select("conv_id", "turn_idx", "pos", "kind", "n_lines")
    )


def validate_sections(markers: DataFrame) -> DataFrame:
    """Repaired sections from a marker table:
    (conv_id, turn_idx, start_line, stop_line, transition)."""
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("pos", "kind")
    nxt_pos = F.lead("pos").over(w)
    nxt_kind = F.lead("kind").over(w)
    stepped = markers.select(
        "conv_id",
        "turn_idx",
        "pos",
        "kind",
        "n_lines",
        nxt_pos.alias("nxt_pos"),
        nxt_kind.alias("nxt_kind"),
    ).filter(F.col("kind") == "START")
    return stepped.select(
        "conv_id",
        "turn_idx",
        F.col("pos").cast("int").alias("start_line"),
        F.coalesce("nxt_pos", "n_lines").cast("int").alias("stop_line"),
        F.when(F.col("nxt_kind") == "STOP", "start-stop")
        .when(F.col("nxt_kind") == "START", "start-start")
        .otherwise("run-to-end")
        .alias("transition"),
    )


def validated_boilerplate_sections(transcripts: DataFrame) -> DataFrame:
    return validate_sections(cutpoint_markers(transcripts))
