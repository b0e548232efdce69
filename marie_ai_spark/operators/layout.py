"""Spark-relational PDF/layout reconstruction: word boxes -> lines ->
reading-order text as pure DataFrame algebra (zero Python in the plan).

This is the relational expression of the same semantics ref_ops
implements procedurally (and the reference implements with OpenCV):

  J1  word->line assignment      interval clustering as a lag()-gap window
                                 (marie/boxes/line_processor.py:15-46)
  T1/T2 line merge               vertical-overlap >= 0.35 criterion
                                 (marie/boxes/line_processor.py:49-178)
  A1  line assembly              groupBy + sorted collect_list
                                 (marie/document/ocr_processor.py:210-247)
  A2  bbox union                 min/max aggregates
                                 (marie/utils/overlap.py:236-254)
  W2  reading order              (line, x) struct sort
                                 (marie/boxes/dit/ulim_dit_box_processor.py:800-815)
  S7/S8 reassembly               \\n within page, \\f between pages
                                 (marie/renderer/text_renderer.py:158)

Cross-validated against the procedural path in tests: both must produce
identical clean_text per turn.

Scale profile: the payload parse (from_json) and explodes are narrow; the
only exchanges are the two groupBys, both keyed by (conv_id, turn_idx[,
page, line]) — high-cardinality keys, no skew. Whole-stage codegen covers
every stage (no UDFs anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PDF_PAYLOAD_SCHEMA = (
    "struct<pages:array<struct<page:int,width:int,height:int,"
    "words:array<struct<id:int,text:string,box:array<int>,conf:double>>>>>"
)

# merge criterion constant: vertical overlap >= 0.35 * min height
VOVERLAP = 0.35


def parse_words(transcripts: DataFrame) -> DataFrame:
    """pdf_words turns -> one row per word with page + box columns.
    JVM-side JSON parse (from_json) + posexplode; Catalyst prunes the
    payload to the fields used downstream."""
    # structural sniff (matches ref_ops.detect._PDF_RE): payload must OPEN
    # with the "pages" key, not merely mention it somewhere in the head
    is_pdf = F.col("text").rlike(r'^\s*\{\s*"pages"\s*:\s*\[')
    parsed = (
        transcripts.filter(is_pdf)
        .select(
            "conv_id",
            "turn_idx",
            F.from_json("text", PDF_PAYLOAD_SCHEMA).alias("doc"),
        )
        .select("conv_id", "turn_idx", F.explode("doc.pages").alias("pg"))
        .select(
            "conv_id",
            "turn_idx",
            F.col("pg.page").alias("page"),
            F.explode("pg.words").alias("w"),
        )
    )
    return parsed.select(
        "conv_id",
        "turn_idx",
        "page",
        F.col("w.id").alias("word_id"),
        F.col("w.text").alias("word"),
        F.col("w.box")[0].alias("x"),
        F.col("w.box")[1].alias("y"),
        F.col("w.box")[2].alias("wd"),
        F.col("w.box")[3].alias("ht"),
        F.col("w.conf").alias("conf"),
    )


def assign_lines(words: DataFrame) -> DataFrame:
    """Line ids per page via the gap-window form of interval clustering:
    scanning words in (y, x, wd, ht, word_id) total order, a new line opens
    when the vertical overlap with the previous word falls below
    VOVERLAP * min(height) — the reference's merge criterion linearized."""
    w = Window.partitionBy("conv_id", "turn_idx", "page").orderBy(
        "y", "x", "wd", "ht", "word_id"
    )
    prev_y = F.lag("y").over(w)
    prev_ht = F.lag("ht").over(w)
    overlap = prev_y + prev_ht - F.col("y")
    new_line = (
        F.when(prev_y.isNull(), F.lit(1))
        .when(overlap < VOVERLAP * F.least("ht", prev_ht), F.lit(1))
        .otherwise(F.lit(0))
    )
    return words.withColumn(
        "line",
        F.sum(new_line).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def assemble_lines(lined: DataFrame) -> DataFrame:
    """A1/A2: per line — x-sorted text join, bbox union, mean confidence."""
    word_key = F.struct(
        F.col("x"), F.col("y"), F.col("word_id"), F.col("word")
    )
    return lined.groupBy("conv_id", "turn_idx", "page", "line").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(word_key)), lambda s: s["word"]
            ),
            " ",
        ).alias("line_text"),
        F.min("x").alias("bx"),
        F.min("y").alias("by"),
        (F.max(F.col("x") + F.col("wd")) - F.min("x")).alias("bw"),
        (F.max(F.col("y") + F.col("ht")) - F.min("y")).alias("bh"),
        F.round(F.avg("conf"), 4).alias("confidence"),
        F.sort_array(F.collect_list("word_id")).alias("wordids"),
    )


def reassemble_text(lines: DataFrame) -> DataFrame:
    """S7/S8: line-sorted join with \\n per page, \\f between pages, blank
    collapse — pure aggregates."""
    line_key = F.struct(F.col("line"), F.col("line_text"))
    pages = lines.groupBy("conv_id", "turn_idx", "page").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(line_key)),
                lambda s: F.trim(s["line_text"]),
            ),
            "\n",
        ).alias("page_text"),
        F.count(F.lit(1)).alias("page_lines"),
    )
    page_key = F.struct(F.col("page"), F.col("page_text"))
    return pages.groupBy("conv_id", "turn_idx").agg(
        F.regexp_replace(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(page_key)),
                    lambda s: s["page_text"],
                ),
                "\f",
            ),
            r"\n\s*\n+",
            "\n",
        ).alias("clean_text"),
        F.sum("page_lines").cast("int").alias("n_lines"),
    )


def pdf_layout_pipeline(transcripts: DataFrame) -> DataFrame:
    """Full relational path: parse -> line-assign -> assemble -> reassemble."""
    return reassemble_text(assemble_lines(assign_lines(parse_words(transcripts))))


def xywh_to_xyxy(box):
    """P1 coordinate conversion (marie/ocr/coordinate_format.py:24-55):
    array<int> [x,y,w,h] -> [x1,y1,x2,y2], pure column transform."""
    return F.array(
        box[0], box[1], box[0] + box[2], box[1] + box[3]
    )


def quantize_boxes(words: DataFrame, buckets: int = 99) -> DataFrame:
    """F9 LMDX coordinate quantization (marie/extract/lmdx/pipeline.py:36-51):
    box centers scaled into 0..buckets for prompt encoding. Requires the
    page width/height columns or uses the stored word columns directly."""
    cx = F.col("x") + F.col("wd") / 2
    cy = F.col("y") + F.col("ht") / 2
    return words.withColumn(
        "qx", F.floor(cx * buckets / F.lit(2550)).cast("int")
    ).withColumn("qy", F.floor(cy * buckets / F.lit(3300)).cast("int"))


def words_in_region(words: DataFrame, x1: float, y1: float, x2: float,
                    y2: float) -> DataFrame:
    """J5 spatial (R-tree style) range query as a predicate — box
    intersection with the query window
    (marie/extract/structures/unstructured_document.py:83-94). At scale
    this is a partition-pruned filter, not an index probe: the words table
    is clustered by (conv_id, turn_idx, page), so the predicate runs
    page-locally at scan speed."""
    return words.filter(
        (F.col("x") < F.lit(x2))
        & (F.col("x") + F.col("wd") > F.lit(x1))
        & (F.col("y") < F.lit(y2))
        & (F.col("y") + F.col("ht") > F.lit(y1))
    )


def knn_words(words: DataFrame, qx: float, qy: float, k: int = 5) -> DataFrame:
    """J5 kNN per page: k nearest word boxes to a query point by center
    distance — window row_number over distance, page-local
    (unstructured_document.py:96-106)."""
    cx = F.col("x") + F.col("wd") / 2
    cy = F.col("y") + F.col("ht") / 2
    dist = F.sqrt(
        (cx - F.lit(qx)) * (cx - F.lit(qx)) + (cy - F.lit(qy)) * (cy - F.lit(qy))
    )
    w = Window.partitionBy("conv_id", "turn_idx", "page").orderBy(
        F.asc("dist"), F.asc("word_id")
    )
    return (
        words.withColumn("dist", F.round(dist, 4))
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
    )


def serialize_blobs(words: DataFrame) -> DataFrame:
    """S10 BlobRenderer sink (marie/renderer/blob_renderer.py:14-90): per
    page, an XML fragment `<blobs><blob x y w h text/>...</blobs>` with
    XML-escaped text, built entirely from aggregate expressions."""
    esc = F.col("word")
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(a), F.lit(b))
    blob = F.concat(
        F.lit('<blob x="'), F.col("x").cast("string"),
        F.lit('" y="'), F.col("y").cast("string"),
        F.lit('" w="'), F.col("wd").cast("string"),
        F.lit('" h="'), F.col("ht").cast("string"),
        F.lit('">'), esc, F.lit("</blob>"),
    )
    key = F.struct(F.col("y"), F.col("x"), F.col("word_id"), F.col("b"))
    return (
        words.withColumn("b", blob)
        .groupBy("conv_id", "turn_idx", "page")
        .agg(
            F.concat(
                F.lit("<blobs>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(key)), lambda s: s["b"]
                    ),
                    "",
                ),
                F.lit("</blobs>"),
            ).alias("blobs_xml"),
            F.count(F.lit(1)).alias("n_blobs"),
        )
    )


def _xml_attr_escape(col):
    """ElementTree _escape_attrib: & first, then < > \" (newlines/tabs don't
    occur in word tokens)."""
    esc = col
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")):
        esc = F.replace(esc, F.lit(a), F.lit(b))
    return esc


def _parse_pages(transcripts: DataFrame) -> DataFrame:
    """pdf_words turns -> one row per page with dims + the word array."""
    # structural sniff (matches ref_ops.detect._PDF_RE): payload must OPEN
    # with the "pages" key, not merely mention it somewhere in the head
    is_pdf = F.col("text").rlike(r'^\s*\{\s*"pages"\s*:\s*\[')
    return (
        transcripts.filter(is_pdf)
        .select(
            "conv_id",
            "turn_idx",
            F.from_json("text", PDF_PAYLOAD_SCHEMA).alias("doc"),
        )
        .select("conv_id", "turn_idx", F.explode("doc.pages").alias("pg"))
        .select(
            "conv_id",
            "turn_idx",
            F.col("pg.page").alias("page"),
            F.col("pg.width").alias("width"),
            F.col("pg.height").alias("height"),
            F.col("pg.words").alias("words"),
        )
    )


_ADLIB_DPI = 300.0


def serialize_adlib(transcripts: DataFrame) -> DataFrame:
    """S11 AdlibRenderer page sink (marie/renderer/adlib_renderer.py:66-124):
    per page, the OCR XML (<PAGE ...><TEXT /><TEXTSTRING .../></PAGE>) as a
    string column, byte-equal to ElementTree serialization (pinned against
    ref_ops/adlib.py). Pure column algebra: from_json parse + one transform
    over the word array — no shuffle at all (the XML assembles inside the
    page row)."""
    pages = _parse_pages(transcripts)
    pnum = (F.col("page") + 1).cast("string")
    fmt = lambda v: F.format_string("%.4f", v)
    word_xml = F.transform(
        F.col("words"),
        lambda w: F.concat(
            F.lit('<TEXTSTRING CONSECUTIVE="FALSE" FONTNAME="Courier" '
                  'FONTSIZE="32" NoLocation="FALSE" PageNumber="'),
            pnum,
            F.lit('" LEFT="'),
            fmt(w["box"][0] / _ADLIB_DPI),
            F.lit('" RIGHT="'),
            fmt((w["box"][0] + w["box"][2]) / _ADLIB_DPI),
            F.lit('" TOP="'),
            fmt((w["box"][1] - w["box"][3]) / _ADLIB_DPI),
            F.lit('" BOTTOM="'),
            fmt((w["box"][1] + w["box"][3]) / _ADLIB_DPI),
            F.lit('" WORD="'),
            _xml_attr_escape(w["text"]),
            F.lit('" />'),
        ),
    )
    page_xml = F.concat(
        F.lit('<PAGE HEIGHT="'),
        (F.col("height") / _ADLIB_DPI).cast("string"),
        F.lit('" WIDTH="'),
        (F.col("width") / _ADLIB_DPI).cast("string"),
        F.lit('" ImageType="Unknown" NUMBER="'),
        pnum,
        F.lit('" OCREndTime="0" OCRStartTime="0" Producer="marie" '
              'XRESOLUTION="300.0" YRESOLUTION="300.0">'),
        F.lit("<TEXT />"),
        F.array_join(word_xml, ""),
        F.lit("</PAGE>"),
    )
    return pages.select(
        "conv_id",
        "turn_idx",
        "page",
        page_xml.alias("page_xml"),
        F.size("words").alias("n_words"),
    )


def adlib_summary(transcripts: DataFrame) -> DataFrame:
    """S11 summary manifest (adlib_renderer.py:30-63): per pdf_words turn,
    the <OCR> summary XML listing every page with its generated filename.
    One groupBy on (conv_id, turn_idx)."""
    pages = _parse_pages(transcripts).select("conv_id", "turn_idx", "page")
    per_doc = pages.groupBy("conv_id", "turn_idx").agg(
        F.array_sort(F.collect_list("page")).alias("pgs")
    )
    # filenames come from the sorted page ORDINAL (row position), not the
    # page value — the renderer twin enumerates range(n_pages), so a
    # document with non-contiguous or non-0-based page numbers still gets
    # 1.tif.xml, 2.tif.xml, ... (adlib_renderer.py default generator)
    page_nodes = F.array_join(
        F.transform(
            F.col("pgs"),
            lambda p, i: F.concat(
                F.lit('<PAGE Filename="'),
                (i + 1).cast("string"),
                F.lit('.tif.xml" NUMBER="'),
                (i + 1).cast("string"),
                F.lit('" />'),
            ),
        ),
        "",
    )
    summary = F.concat(
        F.lit(
            '<OCR><METADATAELEMENTS>'
            '<METADATAELEMENT FIELD="OCR" VALUE="MARIE-AI" />'
            '<METADATAELEMENT FIELD="CreationDate" VALUE="2026-01-01 00:00:00" />'
            "</METADATAELEMENTS><PAGES>"
        ),
        page_nodes,
        F.lit("</PAGES></OCR>"),
    )
    return per_doc.select(
        "conv_id",
        "turn_idx",
        summary.alias("summary_xml"),
        F.size("pgs").alias("n_pages"),
    )
