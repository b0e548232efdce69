"""Multi-line pattern matching semantics: the pure-Python oracle twin of
operators/multiline.py.

Re-expresses the reference's MultiLinePatternMatcher
(marie/extract/annotators/multi_line_matcher.py) with the deterministic
lexical channel as the score (SURVEY §8: model channels are replaced by
deterministic heuristics):

  windows           sliding line windows of the given sizes
                    (multi_line_matcher.py:415-425)
  _overlap_score    0.6 * alnum-token Jaccard + 0.4 * char-3gram Jaccard
                    (multi_line_matcher.py:44-50; token/ngram extraction
                    :34-41)
  suppression       greedy non-overlapping block selection ordered by
                    (-score, start, end) with an occupied-line set
                    (suppress_overlapping_blocks, :20-29)
"""

from __future__ import annotations

import re

_ALNUM = re.compile(r"[A-Za-z0-9]+")

# corpus-tuned defaults shared by the Spark operator, the fixture tool and
# the DuckDB oracle
DEFAULT_REFERENCE_BLOCKS = {
    "kv_block": "- **Key:** value data\n- **Amount:** $1,234.56",
    "table_block": "| key | value | data |\n| row | column | table |",
}
DEFAULT_THRESHOLD = 0.25
DEFAULT_WINDOWS = (2, 3, 4)


def alnum_tokens(s: str) -> set[str]:
    return set(_ALNUM.findall((s or "").lower()))


def char_ngrams(s: str, n: int = 3) -> set[str]:
    s = re.sub(r"\s+", " ", (s or "").lower())
    return {s[i : i + n] for i in range(len(s) - n + 1)} if len(s) >= n else set()


def overlap_score(a: str, b: str) -> float:
    ta, tb = alnum_tokens(a), alnum_tokens(b)
    jt = (len(ta & tb) / max(1, len(ta | tb))) if (ta or tb) else 0.0
    ga, gb = char_ngrams(a), char_ngrams(b)
    jc = (len(ga & gb) / max(1, len(ga | gb))) if (ga and gb) else 0.0
    return 0.6 * jt + 0.4 * jc


def windows(lines: list[str], window_sizes=(2, 3, 4)):
    """(window_text, start_line, end_line, size), 0-based inclusive."""
    out, n = [], len(lines)
    for w in sorted({k for k in window_sizes if k >= 1}):
        if w > n:
            continue
        for s in range(0, n - w + 1):
            out.append(("\n".join(lines[s : s + w]), s, s + w - 1, w))
    return out


def match_candidates(
    text: str,
    reference_blocks: dict[str, str],
    window_sizes=(2, 3, 4),
    threshold: float = 0.35,
) -> list[dict]:
    lines = (text or "").split("\n")
    out = []
    for wtxt, s, e, w in windows(lines, window_sizes):
        for label, ref in reference_blocks.items():
            sc = overlap_score(wtxt, ref)
            if sc >= threshold:
                out.append(
                    {
                        "label": label,
                        "start_line": s,
                        "end_line": e,
                        "window_size": w,
                        "score": sc,
                    }
                )
    return out


def suppress_overlapping_blocks(blocks: list[dict]) -> list[dict]:
    """Greedy: best score first, lines claimed once (reference :20-29).
    The reference breaks exact-score ties by list order (nondeterministic
    under a shuffle); we extend the key with (label, window_size) so the
    distributed and local runs agree."""
    blocks = sorted(
        blocks,
        key=lambda b: (
            -b["score"],
            b["start_line"],
            b["end_line"],
            b.get("label", ""),
            b.get("window_size", 0),
        ),
    )
    chosen, occupied = [], set()
    for b in blocks:
        rng = set(range(b["start_line"], b["end_line"] + 1))
        if occupied.isdisjoint(rng):
            chosen.append(b)
            occupied.update(rng)
    chosen.sort(key=lambda b: (b["start_line"], b["end_line"]))
    return chosen


def match_blocks(
    text: str,
    reference_blocks: dict[str, str],
    window_sizes=(2, 3, 4),
    threshold: float = 0.35,
) -> list[dict]:
    return suppress_overlapping_blocks(
        match_candidates(text, reference_blocks, window_sizes, threshold)
    )
