"""Candidate validator semantics: the full fix_mismatched_sections DFA
(marie/extract/engine/candidate_validator.py:66-187 with the AdaptiveDFA
walk of marie/extract/adaptive_dfa.py:52-70), as a pure function.

The reference sorts all START/STOP cutpoint candidates by position and
walks them through a five-state DFA (BEGIN/START/STOP/CONTINUATION/END);
every VALID transition becomes a repaired section:

  START -> STOP   the normal pair
  START -> START  nested/consecutive starts: the earlier section is closed
                  at the next start
  START -> END    unmatched trailing start runs to end-of-context
                  (_create_end_of_context, :23-60)

STOP->STOP and STOP->START are labeled INVALID (the walk advances but emits
nothing); BEGIN->x emits nothing; STOP->END is FINALIZE. Every (state,
next) pair has a transition, so the walk never aborts.

`dfa_sections` is the LITERAL walk. Because the DFA state after each
marker is always that marker's own kind, the walk provably collapses to
"every START closes at the next marker or end-of-context" — the relational
form in operators/validator.py; the property test pins the equivalence on
random marker sequences.
"""

from __future__ import annotations

_TRANSITIONS = {
    ("BEGIN", "START"): "BEGIN_PROCESS",
    ("BEGIN", "STOP"): "BEGIN_PROCESS",
    ("BEGIN", "END"): None,  # no transition defined in the reference
    ("START", "STOP"): "VALID",
    ("START", "START"): "VALID",
    ("START", "END"): "VALID",
    ("STOP", "STOP"): "INVALID",
    ("STOP", "START"): "INVALID",
    ("STOP", "END"): "FINALIZE",
}


def dfa_sections(
    markers: list[tuple[int, str]], end_pos: int
) -> list[tuple[int, int, str]]:
    """markers: (position, 'START'|'STOP'), any order. Returns repaired
    sections (start_pos, stop_pos, transition) from the literal DFA walk.
    Ties at one position order START before STOP (the reference concatenates
    starts before stops and sorts stably, :84-88)."""
    if not markers:
        return []
    seq = sorted(markers, key=lambda m: (m[0], m[1]))  # 'START' < 'STOP'
    walk = [("BEGIN", None)] + [(k, p) for p, k in seq] + [("END", end_pos)]
    out = []
    for (state, pos), (nstate, npos) in zip(walk, walk[1:]):
        label = _TRANSITIONS.get((state, nstate))
        if label is None:
            break  # would abort in the reference; unreachable per table
        if label == "VALID":
            transition = {
                "STOP": "start-stop",
                "START": "start-start",
                "END": "run-to-end",
            }[nstate]
            out.append((pos, npos, transition))
    return out
