"""Text reassembly primitives.

collapse_blank: blank-run collapse, exactly the reference regex
    `re.sub(r'\\n\\s*\\n+', '\\n', text)`
    (marie/extract/structures/unstructured_document.py:162; marie/ocr/util.py:101-102)
extract_plain: line strip + ordered join, the `meta_to_text` semantics
    (marie/ocr/util.py:47-103)
extract_tool_log: JSON tool-output content extraction
    (models ToolOutput handling, marie/agent/tools/utilities/web_fetch.py:121-133)
"""

from __future__ import annotations

import json
import re

_BLANK_RUN = re.compile(r"\n\s*\n+")


def collapse_blank(text: str) -> str:
    return _BLANK_RUN.sub("\n", text)


def _line_spans(text: str):
    """(start, end) char offsets of each line in text (no trailing newline)."""
    spans = []
    pos = 0
    for line in text.split("\n"):
        spans.append((pos, pos + len(line)))
        pos += len(line) + 1
    return spans


def extract_plain(text: str):
    """clean_text = stripped non-blank lines joined by \\n; spans = one keep
    span per non-blank line (label 'content')."""
    if not text:
        return "", [], 0
    out_lines = []
    spans = []
    for (s, e), line in zip(_line_spans(text), text.split("\n")):
        stripped = line.strip()
        if not stripped:
            continue
        out_lines.append(stripped)
        spans.append((s, e, "content", "keep"))
    return "\n".join(out_lines), spans, len(out_lines)


def extract_tool_log(text: str):
    """Pull the `content` field out of a JSON tool payload; fall back to the
    raw text when the payload is not valid JSON."""
    try:
        obj = json.loads(text)
    except (ValueError, TypeError):
        return extract_plain(text)
    content = obj.get("content", "") if isinstance(obj, dict) else ""
    content = str(content).strip()
    if not content:
        return "", [], 0
    # span = location of the content value inside the original payload
    idx = text.find(content)
    spans = (
        [(idx, idx + len(content), "content", "keep")]
        if idx >= 0
        else [(0, len(text), "content", "keep")]
    )
    return content, spans, 1
