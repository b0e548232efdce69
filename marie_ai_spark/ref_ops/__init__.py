"""Pure-Python operator semantics — the single source of truth.

Both the Spark-side Arrow/pandas UDFs (marie_ai_spark.operators.extract) and
the driver-side pytest oracle import THIS module, so per-turn byte equality
between engine and oracle is guaranteed by construction (mitigation for
SURVEY.md §7.3 risk #1). Nothing in here touches Spark.

Reference semantics re-expressed (citations into /root/reference):
  detect.py      doc-kind sniffing        (marie/utils/docs.py:26-50)
  html_extract   tag-skip + density strip (marie/agent/tools/utilities/web_fetch.py:23-46)
  markdown_ops   section/bullet/table     (marie/extract/parser/base.py:17-170)
  pdf_words_ops  line merge + assembly    (marie/boxes/line_processor.py:49-178,
                                           marie/document/ocr_processor.py:210-247)
  spans_engine   cutpoint keep/drop       (marie/extract/engine/cutpoint_visitor.py:38-161)
  textutil       reassembly + collapse    (marie/ocr/util.py:47-103,
                                           marie/extract/structures/unstructured_document.py:113-164)
"""

from __future__ import annotations

from .detect import detect_doc_kind
from .html_extract import extract_html
from .markdown_ops import extract_markdown
from .pdf_words_ops import extract_pdf_words
from .spans_engine import (
    DEFAULT_RULES,
    apply_cutpoint_rules,
    apply_cutpoint_rules_stateful,
    evolve_open_state,
    turn_rule_events,
)
from .textutil import collapse_blank, extract_plain, extract_tool_log

__all__ = [
    "detect_doc_kind",
    "extract_turn",
    "extract_turn_stateful",
    "extract_conversation",
    "turn_rule_events",
    "evolve_open_state",
    "extract_html",
    "extract_markdown",
    "extract_pdf_words",
    "extract_plain",
    "extract_tool_log",
    "collapse_blank",
    "apply_cutpoint_rules",
    "DEFAULT_RULES",
]

_EXTRACTORS = {
    "html": extract_html,
    "markdown": extract_markdown,
    "pdf_words": extract_pdf_words,
    "tool_log": extract_tool_log,
    "plain": extract_plain,
}


def extract_turn(text: str, rules=DEFAULT_RULES, pdf_mode: str = "compact") -> dict:
    """Extract one turn: detect kind, route to the kind parser, apply the
    cutpoint keep/drop rules. Mirrors the reference pipeline ordering
    (clean -> parse -> span-select -> reassemble), see SURVEY.md §3.3.

    pdf_mode selects the pdf_words sink: 'compact' (meta_to_text) or
    'grid' (TextRenderer fixed-grid placement).

    Returns {doc_kind, clean_text, spans, n_lines} where spans are
    [(start, end, label, action)] char offsets into the ORIGINAL text.
    """
    text = text or ""
    kind = detect_doc_kind(text)
    if kind == "pdf_words":
        clean_text, spans, n_lines = extract_pdf_words(text, pdf_mode)
    else:
        clean_text, spans, n_lines = _EXTRACTORS[kind](text)
    if rules:
        clean_text, spans, n_lines = apply_cutpoint_rules(
            kind, text, clean_text, spans, n_lines, rules
        )
    return {
        "doc_kind": kind,
        "clean_text": clean_text,
        "spans": spans,
        "n_lines": n_lines,
    }


def extract_turn_stateful(
    text: str, rules=DEFAULT_RULES, entry_open=frozenset(), pdf_mode="compact"
):
    """Like extract_turn but with cross-turn continuation state. Returns
    (result dict, exit_open frozenset)."""
    text = text or ""
    kind = detect_doc_kind(text)
    if kind == "pdf_words":
        clean_text, spans, n_lines = extract_pdf_words(text, pdf_mode)
    else:
        clean_text, spans, n_lines = _EXTRACTORS[kind](text)
    exit_open = frozenset(entry_open)
    if rules:
        clean_text, spans, n_lines, exit_open = apply_cutpoint_rules_stateful(
            kind, text, clean_text, spans, n_lines, rules, entry_open
        )
    return (
        {
            "doc_kind": kind,
            "clean_text": clean_text,
            "spans": spans,
            "n_lines": n_lines,
        },
        exit_open,
    )


def turn_events_for_text(text: str, rules=DEFAULT_RULES) -> dict:
    """Lightweight per-turn continuation-event summary for the distributed
    state scan: only line-kind turns can carry cutpoint markers, so the
    expensive html/pdf parsers are never run here."""
    text = text or ""
    kind = detect_doc_kind(text)
    if kind not in ("plain", "markdown"):
        return {}
    clean_text, spans, _n = _EXTRACTORS[kind](text)
    return turn_rule_events(kind, clean_text, spans, rules)


def extract_conversation(texts, rules=DEFAULT_RULES, pdf_mode="compact"):
    """Driver-side conversation-level oracle: extract turns IN ORDER,
    threading the continuation state. `texts` must be ordered by turn_idx."""
    open_rules = frozenset()
    out = []
    for t in texts:
        r, open_rules = extract_turn_stateful(t, rules, open_rules, pdf_mode)
        out.append(r)
    return out
