"""Doc-kind sniffing — the analog of the reference's byte-signature file-type
detection (`get_document_type`, marie/utils/docs.py:26-50), applied to the
`text` payload of a transcript turn instead of file magic bytes.
"""

from __future__ import annotations

import re

_MD_RE = re.compile(r"(?m)^(## |\- \*\*|\|.+\|\s*$)")
# structural sniff: the payload must OPEN with a "pages" key — a tool_log
# whose url/content merely mentions "pages" must not route to the pdf parser
_PDF_RE = re.compile(r'^\{\s*"pages"\s*:\s*\[')


def detect_doc_kind(text: str) -> str:
    if not text or text.isspace():
        return "plain"
    t = text.lstrip()
    if t.startswith("{"):
        return "pdf_words" if _PDF_RE.match(t) else "tool_log"
    low = t[:512].lower()
    if "<html" in low or "<!doctype" in low or "<body" in low:
        return "html"
    if _MD_RE.search(text):
        return "markdown"
    return "plain"
