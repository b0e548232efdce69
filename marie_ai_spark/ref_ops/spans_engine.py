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
        # continuation: an unmatched start keeps the section open across
        # turn boundaries (the reference's continuation strategy,
        # marie/extract/continuation/default_continuation.py, invoked at
        # cutpoint_visitor.py:94-96 to extend sections across page breaks)
        "continuation": True,
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
    if kind == "fuzzy":
        # fuzzy TextSelector strategy (marie/extract/models/base.py:204-212):
        # match when edit distance to the expression is <= 1
        return lambda line: levenshtein(line.strip().lower(), expr.lower()) <= 1
    if kind == "embedding":
        # embedding TextSelector strategy: cosine of hashing-trick
        # bag-of-token vectors >= 0.8 (deterministic, model-free)
        return lambda line: embedding_similarity(line, expr) >= 0.8
    rx = re.compile(expr)
    return lambda line: rx.search(line) is not None


def apply_cutpoint_rules(doc_kind, orig_text, clean_text, spans, n_lines, rules):
    """Stateless form (no cross-turn continuation): apply the rule set to
    an extracted turn; returns updated (clean_text, spans, n_lines)."""
    clean_text, spans, n_lines, _exit = apply_cutpoint_rules_stateful(
        doc_kind, orig_text, clean_text, spans, n_lines, rules, frozenset()
    )
    return clean_text, spans, n_lines


def apply_cutpoint_rules_stateful(
    doc_kind, orig_text, clean_text, spans, n_lines, rules, entry_open
):
    """Apply the rule set with cross-turn continuation state.

    `entry_open` is the set of rule_ids whose NEGATION section is open when
    this turn begins (continuation across page/turn breaks, the reference's
    continuation strategy: marie/extract/continuation/default_continuation.py,
    cutpoint_visitor.py:94-96). An entered-open rule drops lines from the
    top of the turn through its first stop match (or the whole turn, in
    which case it remains open). An unmatched start in a `continuation`
    rule leaves the section open at exit.

    Returns (clean_text, spans, n_lines, exit_open: frozenset).
    """
    if doc_kind not in _LINE_KINDS or not clean_text:
        # state passes through unaffected turns unchanged
        return clean_text, spans, n_lines, frozenset(entry_open)
    lines = clean_text.split("\n")
    # keep-spans are parallel to clean lines for line kinds; drop-spans
    # (e.g. markdown table separators) are passed through untouched
    keep_idx = [i for i, sp in enumerate(spans) if sp[3] == "keep"]
    if len(keep_idx) != len(lines):
        return clean_text, spans, n_lines, frozenset(entry_open)

    spans = [list(sp) for sp in spans]
    deleted: set[int] = set()  # indices into `lines`
    exit_open: set[str] = set()

    for rule in rules:
        if rule["doc_kind"] not in (doc_kind, "*"):
            if rule["rule_id"] in entry_open:
                exit_open.add(rule["rule_id"])  # passthrough
            continue
        is_neg = rule["selection_type"] == "NEGATION"
        cont = bool(rule.get("continuation")) and is_neg
        match_start = _matcher(rule["kind"], rule["start_expr"])
        match_stop = (
            _matcher(rule["kind"], rule["stop_expr"]) if rule["stop_expr"] else None
        )

        def mark(i, drop):
            if drop:
                deleted.add(i)
                spans[keep_idx[i]][2] = rule["label"]
                spans[keep_idx[i]][3] = "drop"
            else:
                spans[keep_idx[i]][2] = rule["label"]

        visible = [i for i in range(len(lines)) if i not in deleted]
        consumed_until = -1

        # close (or extend) a section open from a previous turn
        if rule["rule_id"] in entry_open and cont and match_stop:
            stops_all = [i for i in visible if match_stop(lines[i])]
            if stops_all:
                e = stops_all[0]
                for i in visible:
                    if i <= e:
                        mark(i, True)
                consumed_until = e
            else:
                for i in visible:
                    mark(i, True)
                exit_open.add(rule["rule_id"])
                continue  # whole turn consumed by the open section
            visible = [i for i in range(len(lines)) if i not in deleted]

        starts = [i for i in visible if match_start(lines[i])]
        stops = [i for i in visible if match_stop(lines[i])] if match_stop else []

        for s in starts:
            if s <= consumed_until:
                continue  # start inside an already-claimed section
            if match_stop:
                later = [t for t in stops if t >= s and t > consumed_until]
                # unmatched start -> section runs to end (validator repair);
                # a continuation rule stays open into the next turn
                if later:
                    e = later[0]
                else:
                    e = visible[-1] if visible else s
                    if cont:
                        exit_open.add(rule["rule_id"])
            else:
                e = visible[-1] if visible else s
            consumed_until = e
            for i in visible:
                if s <= i <= e:
                    mark(i, is_neg)

    new_lines = [l for i, l in enumerate(lines) if i not in deleted]
    return (
        "\n".join(new_lines),
        [tuple(sp) for sp in spans],
        len(new_lines),
        frozenset(exit_open),
    )


def turn_rule_events(doc_kind, clean_text, spans, rules):
    """Per-turn start/stop match positions for each continuation rule —
    the lightweight event summary the distributed state scan consumes
    (exact when continuation-rule markers are disjoint from other rules'
    deletions, which DEFAULT_RULES guarantees).

    Returns {rule_id: {"starts": [...], "stops": [...]}} over the turn's
    visible line indices; empty dict for non-line kinds.
    """
    out = {}
    if doc_kind not in _LINE_KINDS or not clean_text:
        return out
    lines = clean_text.split("\n")
    keep = sum(1 for sp in spans if sp[3] == "keep")
    if keep != len(lines):
        return out
    for rule in rules:
        if not rule.get("continuation") or rule["selection_type"] != "NEGATION":
            continue
        if rule["doc_kind"] not in (doc_kind, "*"):
            continue
        match_start = _matcher(rule["kind"], rule["start_expr"])
        match_stop = (
            _matcher(rule["kind"], rule["stop_expr"]) if rule["stop_expr"] else None
        )
        ev = {
            "starts": [i for i, l in enumerate(lines) if match_start(l)],
            "stops": (
                [i for i, l in enumerate(lines) if match_stop(l)]
                if match_stop
                else []
            ),
        }
        if ev["starts"] or ev["stops"]:
            out[rule["rule_id"]] = ev
    return out


def evolve_open_state(entry_open, events, rules):
    """State transition for one turn given its event summary — MUST agree
    with apply_cutpoint_rules_stateful's exit state (tested)."""
    exit_open = set()
    for rule in rules:
        rid = rule["rule_id"]
        cont = bool(rule.get("continuation")) and rule["selection_type"] == "NEGATION"
        if not cont:
            continue
        ev = events.get(rid, {"starts": [], "stops": []})
        open_now = rid in entry_open
        pos = -1
        if open_now:
            later = [t for t in ev["stops"]]
            if later:
                pos = later[0]
                open_now = False
            else:
                exit_open.add(rid)
                continue
        for s in ev["starts"]:
            if s <= pos:
                continue
            later = [t for t in ev["stops"] if t >= s and t > pos]
            if later:
                pos = later[0]
            else:
                open_now = True
                break
        if open_now:
            exit_open.add(rid)
    return frozenset(exit_open)


def levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance (shared by the fuzzy selector kind)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# ---------------------------------------------------------------- embedding
# deterministic hashing-trick embedding for the third TextSelector strategy
# (marie/extract/models/base.py:204-212: equals / fuzzy / embedding);
# vocabulary-free so the oracle and engine share it with no model files

_EMBED_DIM = 32


def embed_line(text: str) -> list[float]:
    """Bag-of-tokens hashing embedding: each token adds +/-1 at a bucket
    derived from its md5; L2-normalized."""
    import hashlib
    import math

    vec = [0.0] * _EMBED_DIM
    for tok in text.lower().split():
        h = hashlib.md5(tok.encode("utf-8", "surrogatepass")).digest()
        idx = h[0] % _EMBED_DIM
        sign = 1.0 if h[1] % 2 == 0 else -1.0
        vec[idx] += sign
    n = math.sqrt(sum(v * v for v in vec))
    return [v / n for v in vec] if n else vec


def embedding_similarity(a: str, b: str) -> float:
    va, vb = embed_line(a), embed_line(b)
    return sum(x * y for x, y in zip(va, vb))
