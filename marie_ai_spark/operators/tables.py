"""Table-region routing (E6) and the struct table output (F4), entirely
JVM-side: GFM table lines are parsed, grouped into records by a row
extraction strategy, and emitted both as the normalized long form (the
MatchFieldRow analog) and as struct<headers, rows, footer> per table.

Reference semantics (re-expressed, not ported):
  - table blocks inside a region, header/body split, column claim by header
    index: marie/extract/engine/match_section_extract_visitor.py:637-905
  - footer detection (flexible TOTAL regex / empty leading cells) and
    data-rows-exclude-footer: match_section_extract_visitor.py:1046-1148
  - row strategies PRIMARY_COLUMN_VARIABLE / PRIMARY_COLUMN_FIXED /
    COMPOSITE_FIXED: marie/extract/models/base.py:7-29 (default VARIABLE,
    models/definition.py:92)
  - GFM surface form: marie/extract/parser/base.py:137-170

Scale shape: one shuffle on (conv_id, turn_idx) for the line windows, then
aggregations on supersets of that key. Every expression is whole-stage
codegen (split/regexp/window/sort_array) — no Python, no collect. The
pure-Python oracle twin is ref_ops/table_ops.py; pytest pins equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FOOTER_RE = r"^(?i)TOTAL:?$"

PRIMARY_COLUMN_VARIABLE = "PRIMARY_COLUMN_VARIABLE"
PRIMARY_COLUMN_FIXED = "PRIMARY_COLUMN_FIXED"
COMPOSITE_FIXED = "COMPOSITE_FIXED"


def _marked_table_lines(transcripts: DataFrame) -> DataFrame:
    """All pipe lines (separators included) tagged with their 0-based
    table_idx per (conv, turn). Cheap pre-filter: only turns containing a
    '|' line survive the scan (predicate pushdown keeps this scan-shaped)."""
    lines = (
        transcripts.filter(F.col("text").rlike(r"(?m)^\s*\|"))
        .select(
            "conv_id",
            "turn_idx",
            F.posexplode(F.split("text", "\n")).alias("line_no", "raw"),
        )
        .withColumn("s", F.trim("raw"))
    )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("line_no")
    marked = lines.withColumn(
        "is_t", F.col("s").startswith("|")
    ).withColumn("is_sep", F.col("s").rlike(r"^\|[\s\-:|]+\|?$"))
    runs = marked.withColumn(
        "new_t",
        (
            F.col("is_t")
            & ~F.coalesce(F.lag("is_t").over(w), F.lit(False))
        ).cast("int"),
    ).withColumn("run_id", F.sum("new_t").over(w)).filter(F.col("is_t"))
    # a run with ONLY separator lines (e.g. a stray '|---|') materializes
    # no table: the twin (ref_ops/table_ops.parse_md_tables) numbers only
    # tables with at least one content line, so such runs must neither
    # claim a table_idx nor emit a phantom extent — drop them and renumber
    # the surviving runs densely
    wr = Window.partitionBy("conv_id", "turn_idx", "run_id")
    wd = Window.partitionBy("conv_id", "turn_idx").orderBy("run_id")
    return (
        runs.withColumn(
            "has_content", F.max((~F.col("is_sep")).cast("int")).over(wr) == 1
        )
        .filter(F.col("has_content"))
        .withColumn("table_idx", F.dense_rank().over(wd) - 1)
    )


def table_extents(transcripts: DataFrame) -> DataFrame:
    """Per-table line extent (first/last pipe line of the contiguous run,
    separator included) — the containment key for span-range collection."""
    return (
        _marked_table_lines(transcripts)
        .groupBy("conv_id", "turn_idx", "table_idx")
        .agg(
            F.min("line_no").alias("first_line"),
            F.max("line_no").alias("last_line"),
        )
    )


def _table_lines(transcripts: DataFrame) -> DataFrame:
    """Content table lines (header + body; separators dropped) with cells."""
    with_idx = _marked_table_lines(transcripts).filter(~F.col("is_sep"))
    wt = Window.partitionBy("conv_id", "turn_idx", "table_idx").orderBy("line_no")
    cells = F.transform(
        F.split(F.regexp_replace(F.col("s"), r"^\||\|$", ""), r"\|"),
        lambda c: F.trim(c),
    )
    return with_idx.select(
        "conv_id",
        "turn_idx",
        "table_idx",
        F.row_number().over(wt).alias("rn"),
        cells.alias("cells"),
    )


def _body_with_groups(tlines: DataFrame, strategy: str, fixed_rows: int):
    """Pad body lines to the header width, peel the footer off the last
    line, and assign record groups per the row strategy."""
    wt = Window.partitionBy("conv_id", "turn_idx", "table_idx").orderBy("rn")
    wfull = wt.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = (
        tlines.withColumn("headers", F.first("cells").over(wfull))
        .withColumn("n_cols", F.size("headers"))
        .withColumn("max_rn", F.max("rn").over(wfull))
        .filter(F.col("rn") >= 2)
    )
    padded = F.slice(
        F.concat(F.col("cells"), F.array_repeat(F.lit(""), F.col("n_cols"))),
        1,
        F.col("n_cols"),
    )
    t = t.withColumn("padded", padded).withColumn(
        "is_footer",
        (F.col("rn") == F.col("max_rn"))
        & (
            F.exists("padded", lambda c: c.rlike(_FOOTER_RE))
            | (
                (F.col("n_cols") >= 2)
                & (F.element_at("padded", 1) == "")
                & (F.element_at("padded", 2) == "")
            )
        ),
    )
    body = t.filter(~F.col("is_footer"))
    wb = Window.partitionBy("conv_id", "turn_idx", "table_idx").orderBy("rn")
    if strategy == PRIMARY_COLUMN_VARIABLE:
        first_body = F.row_number().over(wb) == 1
        new_row = (first_body | (F.element_at("padded", 1) != "")).cast("int")
        body = body.withColumn("row_grp", F.sum(new_row).over(wb) - 1)
    elif strategy in (PRIMARY_COLUMN_FIXED, COMPOSITE_FIXED):
        body = body.withColumn(
            "row_grp",
            ((F.row_number().over(wb) - 1) / max(fixed_rows, 1)).cast("int"),
        )
    else:
        raise ValueError(f"unknown row strategy: {strategy}")
    return body, t


def region_table_rows(
    transcripts: DataFrame,
    strategy: str = PRIMARY_COLUMN_VARIABLE,
    fixed_rows: int = 1,
) -> DataFrame:
    """Normalized long form (the MatchFieldRow analog,
    match_section_extract_visitor.py:848-940): one row per
    (table record, column) with the column claimed by its header cell.

    Columns: conv_id, turn_idx, table_idx, row_idx, col_idx, col_name, value
    (value is the ' '-joined non-empty continuation cells of the record).
    """
    body, _ = _body_with_groups(_table_lines(transcripts), strategy, fixed_rows)
    long = body.select(
        "conv_id",
        "turn_idx",
        "table_idx",
        "row_grp",
        "rn",
        "headers",
        F.posexplode("padded").alias("col_off", "cell"),
    )
    merged = (
        long.groupBy("conv_id", "turn_idx", "table_idx", "row_grp", "col_off")
        .agg(
            F.array_join(
                F.filter(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("rn", "cell"))
                        ),
                        lambda s: s["cell"],
                    ),
                    lambda c: c != "",
                ),
                " ",
            ).alias("value"),
            F.first(F.element_at("headers", F.col("col_off") + 1)).alias("col_name"),
        )
    )
    return merged.select(
        "conv_id",
        "turn_idx",
        "table_idx",
        F.col("row_grp").cast("int").alias("row_idx"),
        F.col("col_off").cast("int").alias("col_idx"),
        "col_name",
        "value",
    )


def region_tables_struct(
    transcripts: DataFrame,
    strategy: str = PRIMARY_COLUMN_VARIABLE,
    fixed_rows: int = 1,
) -> DataFrame:
    """F4 struct output (marie/extract/parser/base.py:137-170): one row per
    table with headers: array<string>, rows: array<array<string>>,
    footer: array<string> (null when absent)."""
    rows_long = region_table_rows(transcripts, strategy, fixed_rows)
    records = (
        rows_long.groupBy("conv_id", "turn_idx", "table_idx", "row_idx")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("col_idx", "value"))),
                lambda s: s["value"],
            ).alias("record")
        )
    )
    rows_per_table = records.groupBy("conv_id", "turn_idx", "table_idx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("row_idx", "record"))),
            lambda s: s["record"],
        ).alias("rows")
    )
    tlines = _table_lines(transcripts)
    # heads from the rn=1 line directly so header-only tables still appear
    heads = tlines.filter(F.col("rn") == 1).select(
        "conv_id", "turn_idx", "table_idx", F.col("cells").alias("headers")
    )
    _, t = _body_with_groups(tlines, strategy, fixed_rows)
    footers = t.filter(F.col("is_footer")).select(
        "conv_id", "turn_idx", "table_idx", F.col("padded").alias("footer")
    )
    return (
        heads.join(rows_per_table, ["conv_id", "turn_idx", "table_idx"], "left")
        .join(footers, ["conv_id", "turn_idx", "table_idx"], "left")
    ).select(
        "conv_id",
        "turn_idx",
        "table_idx",
        "headers",
        F.coalesce("rows", F.array().cast("array<array<string>>")).alias("rows"),
        "footer",
    )


def section_tables(
    transcripts: DataFrame,
    start_expr: str,
    stop_expr: str,
    strategy: str = PRIMARY_COLUMN_VARIABLE,
    fixed_rows: int = 1,
) -> DataFrame:
    """E6 span-range table collection (process_tables,
    match_section_extract_visitor.py:933-1002): tables are collected ONLY
    when their line extent lies strictly inside a validated section span
    (`table_line_id > start_line and table_max_line_id < end_line`, :998)
    and are attributed to that section. Tables outside every matched
    section are excluded — the whole-document scan of region_table_rows is
    the unscoped fallback, this is the reference-faithful scoped route.

    Sections come from the candidate-validator repair
    (operators/validator.py): every START closes at the next marker or at
    end-of-context, so dangling sections still collect their tables.

    Scale shape: three scans of the (pipe/marker-prefiltered) input, each
    shuffling on (conv_id, turn_idx) supersets; the section and extent
    sides are per-turn metadata (a few rows per turn), so both joins are
    skew-safe equi-joins with tiny right sides relative to the cell rows.

    Output: (conv_id, turn_idx, section_idx, table_idx, row_idx, col_idx,
    col_name, value).
    """
    from marie_ai_spark.operators.validator import (
        cutpoint_markers,
        validate_sections,
    )

    secs = validate_sections(cutpoint_markers(transcripts, start_expr, stop_expr))
    wsec = Window.partitionBy("conv_id", "turn_idx").orderBy(
        "start_line", "stop_line"
    )
    secs = secs.withColumn("section_idx", F.row_number().over(wsec) - 1)
    contained = secs.join(table_extents(transcripts), ["conv_id", "turn_idx"]).filter(
        (F.col("first_line") > F.col("start_line"))
        & (F.col("last_line") < F.col("stop_line"))
    )
    rows = region_table_rows(transcripts, strategy, fixed_rows)
    return (
        contained.select(
            "conv_id",
            "turn_idx",
            F.col("section_idx").cast("int").alias("section_idx"),
            "table_idx",
        )
        .join(rows, ["conv_id", "turn_idx", "table_idx"])
        .select(
            "conv_id",
            "turn_idx",
            "section_idx",
            "table_idx",
            "row_idx",
            "col_idx",
            "col_name",
            "value",
        )
    )


def region_table_footers(transcripts: DataFrame) -> DataFrame:
    """Footer cells as document-level fields (the non-repeating route,
    match_section_extract_visitor.py:1199-1269): (conv, turn, table, col_name,
    value) for each non-empty, non-TOTAL footer cell."""
    struct_df = region_tables_struct(transcripts)
    exploded = struct_df.filter(F.col("footer").isNotNull()).select(
        "conv_id",
        "turn_idx",
        "table_idx",
        F.posexplode(F.arrays_zip("headers", "footer")).alias("col_idx", "z"),
    )
    return exploded.select(
        "conv_id",
        "turn_idx",
        "table_idx",
        F.col("col_idx").cast("int").alias("col_idx"),
        F.col("z.headers").alias("col_name"),
        F.col("z.footer").alias("value"),
    ).filter((F.col("value") != "") & ~F.col("value").rlike(_FOOTER_RE))
