"""Cutpoint span engine: selector-matched start/stop pairing with POSITIVE /
NEGATION keep-drop semantics.

Models the reference "Subzero" extract engine core:
  - selector matching (text_equals / regex) over document lines
      marie/extract/cutpoint/cutpoint_matching_engine.py:17-118
      selector DSL: marie/extract/models/base.py:191-256
  - start/stop candidate pairing into sections (as-of pairing; unmatched
    start runs to end-of-document, the STOP_ON_PAGE_BREAK semantics of
    marie/extract/models/base.py:32-38; repair in candidate_validator.py)
  - POSITIVE sections are labeled and kept; NEGATION sections are DELETED
    from the document
      marie/extract/engine/cutpoint_visitor.py:38-116 (NEGATION :90-92,138-161)

Operates on the line-structured kinds (plain, markdown) where the extractor's
span list is parallel to the clean lines, so char offsets into the original
text stay exact after deletion.
"""

from __future__ import annotations

import re

# rules fixture (FIXTURES.md §3) — shared by the oracle and the engine
DEFAULT_RULES = [
    {
        "rule_id": "r-boilerplate",
        "doc_kind": "plain",
        "kind": "regex",
        "start_expr": r"^BEGIN BOILERPLATE$",
        "stop_expr": r"^END BOILERPLATE$",
        "selection_type": "NEGATION",
        "label": "chrome",
    },
    {
        "rule_id": "r-md-section",
        "doc_kind": "markdown",
        "kind": "regex",
        "start_expr": r"^[A-Z][A-Z0-9 ]+$",
        "stop_expr": None,  # STOP_ON_PAGE_BREAK -> runs to end of document
        "selection_type": "POSITIVE",
        "label": "content",
    },
]

_LINE_KINDS = {"plain", "markdown"}


def _matcher(kind: str, expr: str):
    if kind == "text_equals":
        return lambda line: line == expr
    rx = re.compile(expr)
    return lambda line: rx.search(line) is not None


def apply_cutpoint_rules(doc_kind, orig_text, clean_text, spans, n_lines, rules):
    """Apply the rule set to an extracted turn; returns updated
    (clean_text, spans, n_lines)."""
    if doc_kind not in _LINE_KINDS or not clean_text:
        return clean_text, spans, n_lines
    lines = clean_text.split("\n")
    # keep-spans are parallel to clean lines for line kinds; drop-spans
    # (e.g. markdown table separators) are passed through untouched
    keep_idx = [i for i, sp in enumerate(spans) if sp[3] == "keep"]
    if len(keep_idx) != len(lines):
        return clean_text, spans, n_lines

    spans = [list(sp) for sp in spans]
    deleted: set[int] = set()  # indices into `lines`

    for rule in rules:
        if rule["doc_kind"] not in (doc_kind, "*"):
            continue
        match_start = _matcher(rule["kind"], rule["start_expr"])
        match_stop = (
            _matcher(rule["kind"], rule["stop_expr"]) if rule["stop_expr"] else None
        )
        visible = [i for i in range(len(lines)) if i not in deleted]
        starts = [i for i in visible if match_start(lines[i])]
        stops = [i for i in visible if match_stop(lines[i])] if match_stop else []

        consumed_until = -1
        for s in starts:
            if s <= consumed_until:
                continue  # start inside an already-claimed section
            if match_stop:
                later = [t for t in stops if t >= s and t > consumed_until]
                # unmatched start -> section runs to end (validator repair)
                e = later[0] if later else (visible[-1] if visible else s)
            else:
                e = visible[-1] if visible else s
            consumed_until = e
            for i in visible:
                if s <= i <= e:
                    if rule["selection_type"] == "NEGATION":
                        deleted.add(i)
                        spans[keep_idx[i]][2] = rule["label"]
                        spans[keep_idx[i]][3] = "drop"
                    else:
                        spans[keep_idx[i]][2] = rule["label"]

    new_lines = [l for i, l in enumerate(lines) if i not in deleted]
    return (
        "\n".join(new_lines),
        [tuple(sp) for sp in spans],
        len(new_lines),
    )
