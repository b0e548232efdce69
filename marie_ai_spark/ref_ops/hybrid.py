"""Hybrid lexical+embedding annotator semantics: the pure-Python oracle
twin of operators/hybrid.py.

Re-expresses the reference's FaissHybridAnnotator
(marie/extract/annotators/faiss_hybrid_annotator.py) deterministically:

  normalize        uppercase, strip punctuation ([^\\w\\s]+), collapse ws
                   (:481-491)
  candidates       dynamic n-grams per line, sizes by token count
                   (generate_ngrams :606-613, determine_ngram_sizes :615-625)
  hybrid_match     fuzzy-first (cutoff 0.8) -> embedding top-k with critical
                   boost, embedding_weight and softmax -> min_final_score
                   gate (:492-543). The SequenceMatcher/FAISS channels are
                   replaced by deterministic analogs per SURVEY §8:
                   levenshtein ratio and the md5 hashing-trick embedding
                   (ref_ops/spans_engine.py:277) — brute-force over the
                   tiny label set, which IS full-probe exactness.
  dedup            per-document field dedup, highest_confidence strategy
                   with deterministic tie-breaks (:654-668)
"""

from __future__ import annotations

import math
import re

from .spans_engine import embed_line, levenshtein

_PUNCT = re.compile(r"[^\w\s]+")

DEFAULT_TARGET_LABELS = ["customer order", "table scan", "query group", "data row"]
DEFAULT_CRITICAL = ["query group"]
FUZZY_THRESHOLD = 0.8
EMBEDDING_WEIGHT = 0.7
CRITICAL_BOOST = 0.1
MIN_FINAL_SCORE = 0.4
TOP_K = 3
NGRAM_THRESHOLDS = {"short": 3, "medium": 7, "long": 15}


def normalize_for_match(text: str) -> str:
    t = (text or "").upper()
    t = _PUNCT.sub("", t)
    return " ".join(t.split())


def determine_ngram_sizes(text: str) -> list[int]:
    n = len(text.split())
    if n <= NGRAM_THRESHOLDS["short"]:
        return [2, 1]
    if n <= NGRAM_THRESHOLDS["medium"]:
        return [3, 2, 1]
    if n <= NGRAM_THRESHOLDS["long"]:
        return [4, 3, 2, 1]
    return [5, 4, 3, 2, 1]


def generate_ngrams(text: str, sizes: list[int]):
    """(tok_start, size, ngram_text) for every window of every size."""
    toks = text.split()
    out = []
    for size in sizes:
        for i in range(0, len(toks) - size + 1):
            out.append((i, size, " ".join(toks[i : i + size])))
    return out


def fuzzy_ratio(a: str, b: str) -> float:
    """Deterministic fuzzy similarity: 1 - lev/max(len). (The reference uses
    difflib.SequenceMatcher, which is not portable to SQL/JVM; the
    levenshtein ratio is the same family and threshold-compatible.)"""
    m = max(len(a), len(b), 1)
    return 1.0 - levenshtein(a, b) / m


def cosine(a: list[float], b: list[float]) -> float:
    return sum(x * y for x, y in zip(a, b))


def hybrid_match(
    cand_text: str,
    labels: list[str] | None = None,
    critical: list[str] | None = None,
):
    """Returns (label, score, strategy) or None."""
    labels = labels if labels is not None else DEFAULT_TARGET_LABELS
    critical = critical if critical is not None else DEFAULT_CRITICAL
    norm = normalize_for_match(cand_text)
    if not norm:
        return None
    norm_labels = [(normalize_for_match(lbl), lbl) for lbl in labels]

    # 1) fuzzy first
    fuzz = sorted(
        ((fuzzy_ratio(norm, nl), lbl) for nl, lbl in norm_labels),
        key=lambda t: (-t[0], t[1]),
    )[0]
    if fuzz[0] >= FUZZY_THRESHOLD:
        return (fuzz[1], fuzz[0], "fuzzy-direct")

    # 2) embedding: brute-force cosine over every label (== full probe),
    #    rank desc (tie label asc), top-k, boost+weight, softmax, gate
    v = embed_line(norm)
    sims = sorted(
        ((cosine(v, embed_line(nl)), lbl) for nl, lbl in norm_labels),
        key=lambda t: (-t[0], t[1]),
    )[:TOP_K]
    raw = [
        (min(s + CRITICAL_BOOST, 1.0) if lbl in critical else s)
        * EMBEDDING_WEIGHT
        for s, lbl in sims
    ]
    mx = max(raw)
    exps = [math.exp(r - mx) for r in raw]
    tot = sum(exps)
    finals = sorted(
        ((e / tot, lbl) for e, (_, lbl) in zip(exps, sims)),
        key=lambda t: (-t[0], t[1]),
    )
    if finals[0][0] >= MIN_FINAL_SCORE:
        return (finals[0][1], finals[0][0], "embedding-softmax")
    return None


def annotate_text(
    conv_id: str,
    turn_idx: int,
    text: str,
    labels: list[str] | None = None,
    critical: list[str] | None = None,
) -> list[dict]:
    """All (line, ngram) extractions for one turn, pre-dedup."""
    out = []
    for line_no, line in enumerate((text or "").split("\n")):
        sizes = determine_ngram_sizes(line)
        for tok_start, size, ng in generate_ngrams(line, sizes):
            m = hybrid_match(ng, labels, critical)
            if m is None:
                continue
            label, score, strategy = m
            out.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "line_no": line_no,
                    "tok_start": tok_start,
                    "ngram_size": size,
                    "label": label,
                    "value": ng,
                    "strategy": strategy,
                    # fixed-decimal score so dedup tie-breaks and the hash
                    # gate agree with the distributed run (half-up like
                    # Spark's round, not python's banker's rounding)
                    "score": float(
                        __import__("decimal").Decimal(repr(score)).quantize(
                            __import__("decimal").Decimal("0.000001"),
                            rounding=__import__("decimal").ROUND_HALF_UP,
                        )
                    ),
                }
            )
    return out


def dedup_extractions(rows: list[dict]) -> list[dict]:
    """highest_confidence per (conv_id, label), deterministic tie-break by
    document position (deduplicate_field_entries :654-668)."""
    rows = sorted(
        rows,
        key=lambda r: (
            r["conv_id"],
            r["label"],
            -r["score"],
            r["turn_idx"],
            r["line_no"],
            r["tok_start"],
            r["ngram_size"],
        ),
    )
    seen, out = set(), []
    for r in rows:
        k = (r["conv_id"], r["label"])
        if k in seen:
            continue
        seen.add(k)
        out.append(r)
    return out
