"""Deterministic synthetic `transcripts` table generator.

Schema (BASELINE.json input_hint):
    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

Every field of every turn is a pure function of ``(conv_index, turn_idx, seed)``
so generation is embarrassingly parallel: the Spark path fans conversation
index ranges across executors and fills payloads in Arrow-batched pandas
workers; the local path produces the identical rows in a single pandas frame.

Conversation lengths follow a heavy-tailed (Zipf-like) distribution clamped to
[1, 500] so a few conversations are very long — this makes `conv_id` skew
handling in the pipeline load-bearing (cf. SURVEY.md §4 "skew salting").

Payload mix per FIXTURES.md §1.1: plain 30%, html 25%, markdown 15%,
pdf_words 20%, tool_log 10%; ~2% of turns are empty.

Payload shapes model the reference's structures:
  - pdf_words JSON mirrors the OCR word payload
    (reference: marie/document/ocr_processor.py:180-190)
  - html chrome/nav/footer mirrors the tag-skip extraction target
    (reference: marie/agent/tools/utilities/web_fetch.py:23-46)
  - markdown sections/bullets/tables mirror marie/extract/parser/base.py:17-170
"""

from __future__ import annotations

import hashlib
import json
import random
from datetime import datetime, timedelta, timezone

import pandas as pd

EPOCH = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)

VOCAB = (
    "the fast slow big small key value data row column table scan filter join "
    "merge sort group agg window hash stream batch spark query order customer "
    "part line vector dup a content main article section page text word"
).split()

TOOLS = ["web_fetch", "pdf_parse", "search", "code_run", "db_query"]

MAX_CONV_LEN = 500
# Pareto exponent for conversation length: X = U^-K, mean ~= 1/(1-K) = 20
_LEN_K = 0.95


def _u01(*parts) -> float:
    """Deterministic uniform(0,1) from a stable md5 of the parts."""
    h = hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:13], 16) / float(1 << 52)


def _seed(*parts) -> int:
    h = hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:16], 16)


def conv_id_of(conv_index: int) -> str:
    return f"conv-{conv_index:08d}"


def conv_length(conv_index: int, seed: int = 42) -> int:
    """Heavy-tailed conversation length in [1, MAX_CONV_LEN], mean ~20."""
    u = max(_u01("len", seed, conv_index), 1e-12)
    return max(1, min(MAX_CONV_LEN, int(u ** (-_LEN_K))))


def _sentence(rng: random.Random, n_lo=5, n_hi=12) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(n_lo, n_hi)))


def _gen_plain(rng: random.Random) -> str:
    lines = [_sentence(rng) for _ in range(rng.randint(3, 8))]
    if rng.random() < 0.10:
        # embedded boilerplate block targeted by the NEGATION cutpoint rule
        pos = rng.randint(0, len(lines))
        block = (
            ["BEGIN BOILERPLATE"]
            + [_sentence(rng, 3, 6) for _ in range(rng.randint(1, 3))]
            + ["END BOILERPLATE"]
        )
        lines = lines[:pos] + block + lines[pos:]
    if rng.random() < 0.15:
        # blank runs exercise the blank-collapse semantics
        pos = rng.randint(1, len(lines))
        lines = lines[:pos] + ["", ""] + lines[pos:]
    return "\n".join(lines)


def _gen_html(rng: random.Random) -> str:
    title = _sentence(rng, 2, 4)
    nav_links = "".join(
        f'<a href="/p{i}">{rng.choice(VOCAB)}</a> ' for i in range(rng.randint(3, 6))
    )
    foot_links = "".join(
        f'<a href="/f{i}">{rng.choice(VOCAB)} {rng.choice(VOCAB)}</a> '
        for i in range(rng.randint(2, 5))
    )
    paras = "".join(
        f"<p>{_sentence(rng, 8, 16)}</p>" for _ in range(rng.randint(2, 4))
    )
    inline = f"<p>{_sentence(rng, 3, 5)} <b>{rng.choice(VOCAB)}</b> " \
             f'<a href="/x">{rng.choice(VOCAB)}</a> {_sentence(rng, 3, 5)}</p>'
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var x = {rng.randint(1, 99)};</script>"
        f"<style>.m{{color:#000}}</style></head>"
        f"<body><nav>{nav_links}</nav>"
        f'<div class="content"><h1>{title}</h1>{paras}{inline}</div>'
        f"<footer>{foot_links}</footer></body></html>"
    )


def _gen_markdown(rng: random.Random) -> str:
    out = []
    for _ in range(rng.randint(1, 2)):
        out.append(f"## {_sentence(rng, 2, 3).upper()}")
        out.append(_sentence(rng, 6, 12))
        for _ in range(rng.randint(2, 4)):
            out.append(f"- **{rng.choice(VOCAB).title()}:** {_sentence(rng, 2, 5)}")
        if rng.random() < 0.3:
            out.append(f"- **Amount:** ${rng.randint(1, 9999)},{rng.randint(100, 999)}.{rng.randint(10, 99)}")
    if rng.random() < 0.5:
        hdr = [rng.choice(VOCAB) for _ in range(3)]
        out.append("| " + " | ".join(hdr) + " |")
        out.append("|" + "---|" * 3)
        for _ in range(rng.randint(1, 3)):
            out.append("| " + " | ".join(rng.choice(VOCAB) for _ in range(3)) + " |")
            # multi-line table rows: continuation lines carry an empty
            # primary (first) cell and merge into the row above under the
            # PRIMARY_COLUMN_VARIABLE row strategy
            while rng.random() < 0.25:
                out.append(
                    "|  | " + " | ".join(rng.choice(VOCAB) for _ in range(2)) + " |"
                )
        if rng.random() < 0.4:  # footer row (flexible TOTAL match)
            out.append(f"| TOTAL: |  | {rng.randint(10, 9999)}.{rng.randint(10, 99)} |")
    return "\n".join(out)


def _gen_pdf_words(rng: random.Random) -> str:
    n_pages = 2 if rng.random() < 0.10 else 1
    pages = []
    wid = 0
    for p in range(n_pages):
        two_col = rng.random() < 0.20
        words = []
        n_lines = rng.randint(3, 10)
        for li in range(n_lines):
            y = 200 + li * 60 + rng.randint(-3, 3)
            for col in range(2 if two_col else 1):
                x = 100 + col * 1300
                for _ in range(rng.randint(2, 4) if two_col else rng.randint(4, 8)):
                    t = rng.choice(VOCAB)
                    w = len(t) * 20 + 10
                    words.append(
                        {
                            "id": wid,
                            "text": t,
                            "box": [x, y, w, 40],
                            "conf": round(0.90 + rng.random() * 0.099, 4),
                        }
                    )
                    wid += 1
                    x += w + rng.randint(8, 20)
        pages.append({"page": p, "width": 2550, "height": 3300, "words": words})
    return json.dumps({"pages": pages}, separators=(",", ":"))


def _gen_tool_log(rng: random.Random) -> str:
    return json.dumps(
        {
            "status": rng.choice(["ok", "ok", "ok", "error"]),
            "url": f"https://example.com/{rng.choice(VOCAB)}/{rng.randint(1, 999)}",
            "content": _sentence(rng, 6, 14),
        },
        separators=(",", ":"),
    )


_KIND_GEN = {
    "plain": _gen_plain,
    "html": _gen_html,
    "markdown": _gen_markdown,
    "pdf_words": _gen_pdf_words,
    "tool_log": _gen_tool_log,
}

# cumulative shares per FIXTURES.md §1.1
_KIND_CDF = [
    ("plain", 0.30),
    ("html", 0.55),
    ("markdown", 0.70),
    ("pdf_words", 0.90),
    ("tool_log", 1.00),
]


def turn_kind(conv_id: str, turn_idx: int, seed: int = 42) -> str:
    u = _u01("kind", seed, conv_id, turn_idx)
    for kind, hi in _KIND_CDF:
        if u < hi:
            return kind
    return "tool_log"


def _plain_nonempty(cid: str, turn_idx: int, seed: int) -> bool:
    return (
        _u01("empty", seed, cid, turn_idx) >= 0.02
        and turn_kind(cid, turn_idx, seed) == "plain"
    )


def crosses_turn_boundary(conv_index: int, turn_idx: int, seed: int = 42) -> bool:
    """True when turn_idx opens a boilerplate section that closes in
    turn_idx+1 (both plain, both non-empty) — exercises the cross-turn
    continuation semantics (reference continuation strategy,
    marie/extract/continuation/default_continuation.py)."""
    cid = conv_id_of(conv_index)
    return (
        turn_idx + 1 < conv_length(conv_index, seed)
        and _plain_nonempty(cid, turn_idx, seed)
        and _plain_nonempty(cid, turn_idx + 1, seed)
        and _u01("xturn", seed, cid, turn_idx) < 0.05
    )


def gen_turn(conv_index: int, turn_idx: int, seed: int = 42) -> dict:
    """Fully deterministic single-turn row."""
    cid = conv_id_of(conv_index)
    role_i = turn_idx % 3
    rng = random.Random(_seed("turn", seed, cid, turn_idx))
    if rng.random() < 0.10:  # seeded jitter on the role cycle
        role_i = (role_i + 1) % 3
    role = ("user", "assistant", "tool")[role_i]

    if _u01("empty", seed, cid, turn_idx) < 0.02:
        text = ""
    else:
        text = _KIND_GEN[turn_kind(cid, turn_idx, seed)](rng)
        # cross-turn boilerplate: a dangling BEGIN at the end of this turn
        # and/or the closing END at the start (separate rng stream so the
        # base payload bytes are unchanged)
        if crosses_turn_boundary(conv_index, turn_idx, seed):
            xr = random.Random(_seed("xjunk", seed, cid, turn_idx))
            tail = ["BEGIN BOILERPLATE"] + [
                _sentence(xr, 3, 6) for _ in range(xr.randint(1, 2))
            ]
            text = text + "\n" + "\n".join(tail)
        if turn_idx > 0 and crosses_turn_boundary(conv_index, turn_idx - 1, seed):
            xr = random.Random(_seed("xjunk2", seed, cid, turn_idx))
            head = [
                _sentence(xr, 3, 6) for _ in range(xr.randint(1, 2))
            ] + ["END BOILERPLATE"]
            text = "\n".join(head) + "\n" + text

    tool = rng.choice(TOOLS) if role == "tool" else ""
    ts = EPOCH + timedelta(seconds=conv_index * 211 + turn_idx * 17)
    return {
        "conv_id": cid,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts.replace(tzinfo=None),
    }


def gen_pandas(n_convs: int, seed: int = 42, conv_offset: int = 0) -> pd.DataFrame:
    """Local (driver-side) generation — identical rows to the Spark path."""
    rows = []
    for i in range(conv_offset, conv_offset + n_convs):
        for t in range(conv_length(i, seed)):
            rows.append(gen_turn(i, t, seed))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


# ----------------------------------------------------- section-table corpus
# Dedicated deterministic corpus for the span-range table collection
# operator (E6 process_tables,
# marie/extract/engine/match_section_extract_visitor.py:933): documents mix
# GFM tables OUTSIDE any matched section (must be excluded) with tables
# INSIDE marker-delimited sections (attributed to their section), including
# dangling-BEGIN sections that run to end-of-context. The main transcript
# corpus keeps tables and section markers in disjoint payload kinds, so
# this operator gets its own input (same pattern as the media queries).

SECTION_START = "BEGIN DETAILS"
SECTION_STOP = "END DETAILS"


def _gfm_table(rng: random.Random) -> list[str]:
    hdr = [rng.choice(VOCAB) for _ in range(3)]
    out = ["| " + " | ".join(hdr) + " |", "|" + "---|" * 3]
    for _ in range(rng.randint(1, 3)):
        out.append("| " + " | ".join(rng.choice(VOCAB) for _ in range(3)) + " |")
        while rng.random() < 0.25:  # continuation rows (empty primary cell)
            out.append(
                "|  | " + " | ".join(rng.choice(VOCAB) for _ in range(2)) + " |"
            )
    if rng.random() < 0.3:  # flexible-TOTAL footer row
        out.append(f"| TOTAL: |  | {rng.randint(10, 9999)}.{rng.randint(10, 99)} |")
    return out


def _section_doc_row(i: int, seed: int) -> dict:
    """One fully deterministic section-doc row (pure function of (i, seed),
    so the Spark path and the pandas/fixture path generate identical rows)."""
    rng = random.Random(_seed("secdoc", seed, i))
    lines = [_sentence(rng) for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.5:  # out-of-section table: must be excluded
        lines += _gfm_table(rng)
        lines.append(_sentence(rng))
    for _ in range(rng.randint(1, 2)):
        lines.append(SECTION_START)
        lines.append(_sentence(rng, 3, 6))
        for _ in range(rng.randint(0, 2)):  # in-section tables
            lines += _gfm_table(rng)
            lines.append(_sentence(rng, 3, 6))
        if rng.random() < 0.9:
            lines.append(SECTION_STOP)
            lines.append(_sentence(rng))
        else:
            break  # dangling BEGIN: section runs to end-of-context
    if rng.random() < 0.3:  # trailing table (outside iff section closed)
        lines += _gfm_table(rng)
    return {"conv_id": f"secdoc-{i:06d}", "turn_idx": 0, "text": "\n".join(lines)}


def gen_section_docs_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    df = pd.DataFrame([_section_doc_row(i, seed) for i in range(n_docs)])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def gen_section_docs_spark(spark, n_docs: int, seed: int = 42, partitions=None):
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, parts).withColumnRenamed("id", "doc_index")

    def fill(batches):
        for pdf in batches:
            rows = [_section_doc_row(int(i), seed) for i in pdf["doc_index"]]
            if rows:
                out = pd.DataFrame(rows)
                out["turn_idx"] = out["turn_idx"].astype("int32")
                yield out

    return base.mapInPandas(fill, schema="conv_id string, turn_idx int, text string")


def gen_spark(spark, n_convs: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: conversation ids fan out across executors, each
    Arrow batch fills its turns locally. No shuffle, no driver materialization.
    """
    from pyspark.sql import functions as F

    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_convs, 1, parts).withColumnRenamed("id", "conv_index")

    def fill(batches):
        for pdf in batches:
            rows = []
            for i in pdf["conv_index"]:
                i = int(i)
                for t in range(conv_length(i, seed)):
                    rows.append(gen_turn(i, t, seed))
            if rows:
                out = pd.DataFrame(rows)
                out["turn_idx"] = out["turn_idx"].astype("int32")
                yield out

    return base.mapInPandas(fill, schema=TRANSCRIPTS_DDL)


def write_transcripts(spark, path: str, n_convs: int, seed: int = 42,
                      partitions: int | None = None) -> None:
    gen_spark(spark, n_convs, seed, partitions).write.mode("overwrite").parquet(path)
