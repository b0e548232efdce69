"""Doc-kind sniffing — the analog of the reference's byte-signature file-type
detection (`get_document_type`, marie/utils/docs.py:26-50), applied to the
`text` payload of a transcript turn instead of file magic bytes.
"""

from __future__ import annotations

import re

_MD_RE = re.compile(r"(?m)^(## |\- \*\*|\|.+\|\s*$)")


def detect_doc_kind(text: str) -> str:
    if not text or text.isspace():
        return "plain"
    t = text.lstrip()
    if t.startswith("{"):
        head = t[:256]
        return "pdf_words" if '"pages"' in head else "tool_log"
    low = t[:512].lower()
    if "<html" in low or "<!doctype" in low or "<body" in low:
        return "html"
    if _MD_RE.search(text):
        return "markdown"
    return "plain"
