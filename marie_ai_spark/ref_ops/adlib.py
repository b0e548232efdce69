"""Adlib renderer semantics (S11): the pure-Python oracle twin of
operators/layout.serialize_adlib / adlib_summary.

Builds the per-page OCR XML and the summary manifest with ElementTree —
the same construction as the reference (marie/renderer/adlib_renderer.py:
66-124 __render_page, :30-63 write_adlib_summary_tree) — so the Spark
string-concat sink is pinned against real ElementTree serialization
(attribute order, escaping, self-closing forms).

Deterministic deltas from the reference, documented:
  - CreationDate is a fixed constant (the reference stamps now(), which
    can never hash-match a distributed run);
  - page filenames use the default generator `{n}.tif.xml` (:144).
"""

from __future__ import annotations

import xml.etree.ElementTree as gfg

CREATION_DATE = "2026-01-01 00:00:00"
DPI = 300.0


def render_page_xml(page_number: int, width: int, height: int, words) -> str:
    """words: iterable of dicts with id/text/box (XYWH ints), in payload
    (word id) order — adlib_renderer.py:66-124."""
    root = gfg.Element("PAGE")
    root.set("HEIGHT", str(height / DPI))
    root.set("WIDTH", str(width / DPI))
    root.set("ImageType", "Unknown")
    root.set("NUMBER", str(page_number))
    root.set("OCREndTime", "0")
    root.set("OCRStartTime", "0")
    root.set("Producer", "marie")
    root.set("XRESOLUTION", str(DPI))
    root.set("YRESOLUTION", str(DPI))
    root.append(gfg.Element("TEXT"))
    for word in sorted(words, key=lambda w: w["id"]):
        x1, y1, w1, h1 = word["box"]
        x, y = x1 / DPI, y1 / DPI
        w, h = w1 / DPI, h1 / DPI
        m1 = gfg.Element("TEXTSTRING")
        m1.set("CONSECUTIVE", "FALSE")
        m1.set("FONTNAME", "Courier")
        m1.set("FONTSIZE", "32")
        m1.set("NoLocation", "FALSE")
        m1.set("PageNumber", str(page_number))
        m1.set("LEFT", f"{x:.4f}")
        m1.set("RIGHT", f"{x + w:.4f}")
        m1.set("TOP", f"{y - h:.4f}")
        m1.set("BOTTOM", f"{y + h:.4f}")
        m1.set("WORD", str(word["text"]))
        root.append(m1)
    return gfg.tostring(root, encoding="unicode")


def render_summary_xml(n_pages: int) -> str:
    """adlib_renderer.py:30-63 with the default `{n}.tif.xml` generator."""
    root = gfg.Element("OCR")
    metas = gfg.Element("METADATAELEMENTS")

    def _meta(field, val):
        m = gfg.Element("METADATAELEMENT")
        m.set("FIELD", str(field))
        m.set("VALUE", str(val))
        return m

    metas.append(_meta("OCR", "MARIE-AI"))
    metas.append(_meta("CreationDate", CREATION_DATE))
    root.append(metas)
    pages_node = gfg.Element("PAGES")
    for page_index in range(n_pages):
        n = page_index + 1
        node = gfg.Element("PAGE")
        node.set("Filename", f"{n}.tif.xml")
        node.set("NUMBER", str(n))
        pages_node.append(node)
    root.append(pages_node)
    return gfg.tostring(root, encoding="unicode")
