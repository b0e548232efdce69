"""Markdown extraction: section headers, bold-key bullets, GFM tables.

Models the reference's markdown parsers:
  - section split on `^## ` (marie/extract/parser/base.py:17-24)
  - `- **Key:** value` bullets -> key/value rows with the bold-key strategy
    (marie/extract/parser/base.py:27-134)
  - GFM table -> headers + rows (marie/extract/parser/base.py:137-170)

Line-oriented so span offsets into the original text are exact.
Labels: 'content' (headers/prose), 'kv' (bullets), 'table' (table rows;
the `|---|` separator row is a drop span).
"""

from __future__ import annotations

import re

_HDR = re.compile(r"^##\s+(.*)$")
_KV = re.compile(r"^-\s+\*\*(.+?)\*\*\s*:?\s*(.*)$")
_KV_COLON_IN = re.compile(r"^(.+?):$")
_TABLE_SEP = re.compile(r"^\|[\s\-:|]+\|?\s*$")


def _line_spans(text: str):
    spans = []
    pos = 0
    for line in text.split("\n"):
        spans.append((pos, pos + len(line)))
        pos += len(line) + 1
    return spans


def extract_markdown(text: str):
    if not text:
        return "", [], 0
    out_lines = []
    spans = []
    for (s, e), line in zip(_line_spans(text), text.split("\n")):
        stripped = line.strip()
        if not stripped:
            continue
        m = _HDR.match(stripped)
        if m:
            out_lines.append(m.group(1).strip())
            spans.append((s, e, "content", "keep"))
            continue
        m = _KV.match(stripped)
        if m:
            key, value = m.group(1).strip(), m.group(2).strip()
            mk = _KV_COLON_IN.match(key)
            if mk:  # '- **Key:** value' captures 'Key:' -> strip the colon
                key = mk.group(1).strip()
            out_lines.append(f"{key}: {value}" if value else f"{key}:")
            spans.append((s, e, "kv", "keep"))
            continue
        if _TABLE_SEP.match(stripped):
            spans.append((s, e, "table", "drop"))
            continue
        if stripped.startswith("|"):
            cells = [c.strip() for c in stripped.strip("|").split("|")]
            out_lines.append(" | ".join(cells))
            spans.append((s, e, "table", "keep"))
            continue
        out_lines.append(stripped)
        spans.append((s, e, "content", "keep"))
    return "\n".join(out_lines), spans, len(out_lines)
