"""Materialize driver-oracle fixtures (no Spark involved).

Two kinds, both pinned to the 100-conversation / seed-42 shape the driver
uses for correctness at sf0.01:

  fixtures/transcripts_c100_s42.parquet
      the raw synthetic transcripts (conv_id, turn_idx, text). DuckDB
      oracle SQL re-parses these IN SQL (markdown KV / tables / fields) —
      a third independent implementation vs Spark and ref_ops.

  fixtures/oracle/*.parquet
      expected outputs computed by the pure-Python ref_ops oracle (NOT by
      the Spark path) for the pandas-UDF pipeline queries that cannot be
      re-expressed in SQL. oracle_sql() reads them with read_parquet(),
      giving the driver a real row/hash check instead of `no_oracle`.

Regenerate with `python tools/make_fixtures.py` after any ref_ops or
generator change; pytest (tests/test_fixtures_current.py) fails if the
checked-in fixtures drift from the code.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marie_ai_spark.ref_ops import extract_conversation, extract_turn
from marie_ai_spark.ref_ops.adlib import render_page_xml, render_summary_xml
from marie_ai_spark.ref_ops.boxes import merge_boxes, merge_boxes_by_iou
from marie_ai_spark.ref_ops.hybrid import annotate_text, dedup_extractions
from marie_ai_spark.ref_ops.multiline import (
    DEFAULT_REFERENCE_BLOCKS,
    DEFAULT_THRESHOLD,
    match_blocks,
)
from marie_ai_spark.sources.transcripts import gen_pandas

N_CONVS = 100
SEED = 42
ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def transcripts_df() -> pd.DataFrame:
    return gen_pandas(N_CONVS, seed=SEED)


def extract_oracle(df: pd.DataFrame) -> pd.DataFrame:
    recs = []
    for row in df.itertuples():
        r = extract_turn(row.text)
        recs.append(
            {
                "conv_id": row.conv_id,
                "turn_idx": int(row.turn_idx),
                "doc_kind": r["doc_kind"],
                "clean_text": r["clean_text"],
                "n_lines": int(r["n_lines"]),
                "spans": [tuple(s) for s in r["spans"]],
            }
        )
    return pd.DataFrame(recs).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def continuation_oracle(df: pd.DataFrame) -> pd.DataFrame:
    recs = []
    for cid, g in df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id", sort=True):
        for (_, row), r in zip(g.iterrows(), extract_conversation(list(g.text))):
            recs.append(
                {
                    "conv_id": cid,
                    "turn_idx": int(row.turn_idx),
                    "doc_kind": r["doc_kind"],
                    "clean_text": r["clean_text"],
                    "n_lines": int(r["n_lines"]),
                }
            )
    return pd.DataFrame(recs)


def grid_oracle(df: pd.DataFrame) -> pd.DataFrame:
    recs = []
    for row in df.itertuples():
        r = extract_turn(row.text, pdf_mode="grid")
        if r["doc_kind"] != "pdf_words":
            continue
        recs.append(
            {
                "conv_id": row.conv_id,
                "turn_idx": int(row.turn_idx),
                "clean_text": r["clean_text"],
                "n_lines": int(r["n_lines"]),
            }
        )
    return pd.DataFrame(recs)


def rollup_oracle(ex: pd.DataFrame) -> pd.DataFrame:
    g = ex.groupby("conv_id")
    out = pd.DataFrame(
        {
            "n_turns": g.size(),
            "n_lines": g["n_lines"].sum(),
            "n_clean_chars": g["clean_text"].apply(lambda s: sum(len(x) for x in s)),
            "n_html_turns": g["doc_kind"].apply(lambda s: int((s == "html").sum())),
            "n_pdf_turns": g["doc_kind"].apply(lambda s: int((s == "pdf_words").sum())),
            "max_turn_idx_plus1": g["turn_idx"].max() + 1,
        }
    ).reset_index()
    return out


def span_regions_oracle(ex: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in ex.itertuples():
        for (start, end, label, action) in r.spans:
            rows.append((label, action, end - start))
    df = pd.DataFrame(rows, columns=["label", "action", "chars"])
    return (
        df.groupby(["label", "action"])
        .agg(n_regions=("chars", "size"), n_chars=("chars", "sum"))
        .reset_index()
    )


def multiline_oracle(df: pd.DataFrame) -> pd.DataFrame:
    recs = []
    for row in df.itertuples():
        for b in match_blocks(
            row.text, DEFAULT_REFERENCE_BLOCKS, threshold=DEFAULT_THRESHOLD
        ):
            recs.append(
                {
                    "conv_id": row.conv_id,
                    "turn_idx": int(row.turn_idx),
                    "label": b["label"],
                    "start_line": int(b["start_line"]),
                    "end_line": int(b["end_line"]),
                    "window_size": int(b["window_size"]),
                    "score": float(b["score"]),
                }
            )
    return pd.DataFrame(
        recs,
        columns=[
            "conv_id",
            "turn_idx",
            "label",
            "start_line",
            "end_line",
            "window_size",
            "score",
        ],
    )


HYBRID_COLS = [
    "conv_id",
    "label",
    "strategy",
    "value",
    "turn_idx",
    "line_no",
    "tok_start",
    "ngram_size",
    "score",
]


def hybrid_oracle(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for row in df.itertuples():
        rows.extend(annotate_text(row.conv_id, int(row.turn_idx), row.text))
    kept = dedup_extractions(rows)
    return pd.DataFrame(
        [{k: r[k] for k in HYBRID_COLS} for r in kept], columns=HYBRID_COLS
    )


def _pdf_docs(df: pd.DataFrame):
    import json

    from marie_ai_spark.ref_ops.detect import detect_doc_kind

    for row in df.itertuples():
        if detect_doc_kind(row.text or "") == "pdf_words":
            yield row, json.loads(row.text)


def adlib_pages_oracle(df: pd.DataFrame) -> pd.DataFrame:
    recs = []
    for row, doc in _pdf_docs(df):
        for pg in doc["pages"]:
            recs.append(
                {
                    "conv_id": row.conv_id,
                    "turn_idx": int(row.turn_idx),
                    "page": int(pg["page"]),
                    "page_xml": render_page_xml(
                        pg["page"] + 1, pg["width"], pg["height"], pg["words"]
                    ),
                    "n_words": len(pg["words"]),
                }
            )
    return pd.DataFrame(recs)


def blobs_oracle(df: pd.DataFrame) -> pd.DataFrame:
    """S10 BlobRenderer twin: per page, `<blobs><blob .../></blobs>` with
    blobs ordered by (y, x, word_id, fragment) and &/</> escaped — the
    python mirror of operators/layout.serialize_blobs."""

    def esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    recs = []
    for row, doc in _pdf_docs(df):
        for pg in doc["pages"]:
            frags = []
            for w in pg["words"]:
                x, y, wd, ht = w["box"]
                b = (
                    f'<blob x="{x}" y="{y}" w="{wd}" h="{ht}">'
                    f"{esc(w['text'])}</blob>"
                )
                frags.append((y, x, w["id"], b))
            frags.sort()
            recs.append(
                {
                    "conv_id": row.conv_id,
                    "turn_idx": int(row.turn_idx),
                    "page": int(pg["page"]),
                    "blobs_xml": "<blobs>" + "".join(b for *_, b in frags) + "</blobs>",
                    "n_blobs": len(frags),
                }
            )
    return pd.DataFrame(recs)


BOX_INFLATE_X = 24  # widen boxes so gap-separated words actually merge


def _box_merge_oracle(df: pd.DataFrame, fn) -> pd.DataFrame:
    recs = []
    for row, doc in _pdf_docs(df):
        for pg in doc["pages"]:
            words = sorted(pg["words"], key=lambda w: w["id"])
            boxes = [
                [w["box"][0], w["box"][1],
                 w["box"][0] + w["box"][2] + BOX_INFLATE_X,
                 w["box"][1] + w["box"][3]]
                for w in words
            ]
            for i, b in enumerate(fn(boxes)):
                recs.append(
                    {
                        "conv_id": row.conv_id,
                        "turn_idx": int(row.turn_idx),
                        "page": int(pg["page"]),
                        "block_idx": i,
                        "x1": int(b[0]),
                        "y1": int(b[1]),
                        "x2": int(b[2]),
                        "y2": int(b[3]),
                    }
                )
    return pd.DataFrame(recs)


def merge_iou_oracle(df: pd.DataFrame) -> pd.DataFrame:
    return _box_merge_oracle(df, merge_boxes_by_iou)


def merge_horizontal_oracle(df: pd.DataFrame) -> pd.DataFrame:
    return _box_merge_oracle(df, merge_boxes)


def adlib_summary_oracle(df: pd.DataFrame) -> pd.DataFrame:
    recs = []
    for row, doc in _pdf_docs(df):
        recs.append(
            {
                "conv_id": row.conv_id,
                "turn_idx": int(row.turn_idx),
                "summary_xml": render_summary_xml(len(doc["pages"])),
                "n_pages": len(doc["pages"]),
            }
        )
    return pd.DataFrame(recs)


def region_tables_oracle(df: pd.DataFrame) -> pd.DataFrame:
    """Long-form table records via the ref_ops twin (third implementation
    relative to the Spark plan and the retired tier-2 DuckDB re-parse CTE):
    one row per (table record, column), schema matching
    operators/tables.region_table_rows. Fixture-parquet oracles are the
    driver-portable tier (r2: 8/8 green vs version-sensitive exotic SQL)."""
    from marie_ai_spark.ref_ops.table_ops import parse_md_tables

    recs = []
    for row in df.itertuples():
        for t in parse_md_tables(row.text or ""):
            for ri, record in enumerate(t["rows"]):
                for ci, value in enumerate(record):
                    recs.append(
                        {
                            "conv_id": row.conv_id,
                            "turn_idx": int(row.turn_idx),
                            "table_idx": int(t["table_idx"]),
                            "row_idx": ri,
                            "col_idx": ci,
                            "col_name": t["headers"][ci],
                            "value": value,
                        }
                    )
    out = pd.DataFrame(recs)
    out["row_idx"] = out["row_idx"].astype("int32")
    out["col_idx"] = out["col_idx"].astype("int32")
    return out


def region_table_footers_oracle(df: pd.DataFrame) -> pd.DataFrame:
    """Footer cells as document-level fields (non-empty, non-TOTAL), the
    twin of operators/tables.region_table_footers."""
    from marie_ai_spark.ref_ops.table_ops import _FOOTER_TOTAL, parse_md_tables

    recs = []
    for row in df.itertuples():
        for t in parse_md_tables(row.text or ""):
            if t["footer"] is None:
                continue
            for ci, value in enumerate(t["footer"]):
                if value == "" or _FOOTER_TOTAL.match(value):
                    continue
                recs.append(
                    {
                        "conv_id": row.conv_id,
                        "turn_idx": int(row.turn_idx),
                        "table_idx": int(t["table_idx"]),
                        "col_idx": ci,
                        "col_name": t["headers"][ci],
                        "value": value,
                    }
                )
    out = pd.DataFrame(recs)
    out["col_idx"] = out["col_idx"].astype("int32")
    return out


def section_tables_oracle(n_docs: int = 200, seed: int = 42) -> pd.DataFrame:
    """E6 span-range table collection over the dedicated section-doc corpus
    (sources/transcripts.gen_section_docs_pandas): DFA-validated sections +
    strict line-extent containment, via the ref_ops twin."""
    from marie_ai_spark.ref_ops.table_ops import section_tables_py
    from marie_ai_spark.sources.transcripts import (
        SECTION_START,
        SECTION_STOP,
        gen_section_docs_pandas,
    )

    docs = gen_section_docs_pandas(n_docs, seed)
    recs = []
    for row in docs.itertuples():
        for rec in section_tables_py(
            row.text, f"^{SECTION_START}$", f"^{SECTION_STOP}$"
        ):
            recs.append(
                {
                    "conv_id": row.conv_id,
                    "turn_idx": int(row.turn_idx),
                    "section_idx": rec["section_idx"],
                    "table_idx": rec["table_idx"],
                    "row_idx": rec["row_idx"],
                    "col_idx": rec["col_idx"],
                    "col_name": rec["col_name"],
                    "value": rec["value"],
                }
            )
    out = pd.DataFrame(recs)
    for c in ("section_idx", "row_idx", "col_idx"):
        out[c] = out[c].astype("int32")
    return out


def scrub_pii_oracle(n_docs: int = 300, seed: int = 42) -> pd.DataFrame:
    """Independent python-re replay of the PII scrub over the shared
    deterministic corpus: per class (in spec order), count non-overlapping
    matches on the so-far-masked text, then mask. Only the rule list (the
    spec) is shared with the operator; the masking loop is this file's."""
    import re

    from marie_ai_spark.operators.curation import PII_RULES, gen_pii_rows

    recs = []
    for doc_id, text in gen_pii_rows(n_docs, seed):
        masked = text
        counts = {}
        for name, pattern, token in PII_RULES:
            rx = re.compile(pattern)
            counts[f"n_{name}"] = len(rx.findall(masked))
            masked = rx.sub(token, masked)
        recs.append(
            {
                "doc_id": doc_id,
                "clean_text": masked,
                **counts,
                "n_pii": sum(counts.values()),
            }
        )
    out = pd.DataFrame(recs)
    for c in out.columns:
        if c.startswith("n_"):
            out[c] = out[c].astype("int32")
    return out


# Second, independent implementation of ref_ops/media.py's DCT
# bit-exactness contract (see that module's docstring): float64, separable
# 8x8 transforms, ASCENDING index accumulation, quantization rounds half
# away from zero, pixels round half-up after the +128 level shift.
_Q50 = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def _jpeg_pipeline_mean(pix: bytes, w: int, h: int) -> float:
    import math

    ct = [[math.cos((2 * x + 1) * k * math.pi / 16) for x in range(8)]
          for k in range(8)]
    al = [1.0 / math.sqrt(2.0)] + [1.0] * 7
    total = 0
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            s = [[0] * 8 for _ in range(8)]
            for y in range(8):
                yy = min(by * 8 + y, h - 1)
                for x in range(8):
                    s[y][x] = pix[yy * w + min(bx * 8 + x, w - 1)] - 128
            # forward: rows of cos over y, then x; quantize half-away
            t = [[sum(s[y][x] * ct[v][y] for y in range(8)) for x in range(8)]
                 for v in range(8)]
            q = [[0] * 8 for _ in range(8)]
            for v in range(8):
                for u in range(8):
                    acc = 0.0
                    for x in range(8):
                        acc += t[v][x] * ct[u][x]
                    val = 0.25 * (al[u] * al[v]) * acc
                    val /= _Q50[v * 8 + u]
                    q[v][u] = (
                        int(math.floor(val + 0.5)) if val >= 0
                        else int(math.ceil(val - 0.5))
                    )
            # inverse
            r = [[q[v][u] * _Q50[v * 8 + u] for u in range(8)]
                 for v in range(8)]
            tt = [[0.0] * 8 for _ in range(8)]
            for v in range(8):
                for x in range(8):
                    acc = 0.0
                    for u in range(8):
                        acc += (al[u] * r[v][u]) * ct[u][x]
                    tt[v][x] = acc
            for y in range(8):
                if by * 8 + y >= h:
                    break
                for x in range(8):
                    if bx * 8 + x >= w:
                        continue
                    acc = 0.0
                    for v in range(8):
                        acc += (al[v] * tt[v][x]) * ct[v][y]
                    p = int(math.floor(0.25 * acc + 128.0 + 0.5))
                    total += 0 if p < 0 else (255 if p > 255 else p)
    return total / (w * h * 255.0)


def _mp4_samples_flat(b: bytes) -> tuple[list, int]:
    """Flat-scan stsz sizes + stco first-chunk offset (moov precedes mdat,
    so the first tag occurrence is authoritative)."""
    import struct

    sizes = []
    off0 = 0
    i = b.find(b"stsz")
    if i >= 0:
        fixed, count = struct.unpack(">II", b[i + 8 : i + 16])
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = [
                struct.unpack(">I", b[i + 16 + 4 * k : i + 20 + 4 * k])[0]
                for k in range(count)
            ]
    j = b.find(b"stco")
    if j >= 0:
        n, = struct.unpack(">I", b[j + 8 : j + 12])
        if n:
            off0, = struct.unpack(">I", b[j + 12 : j + 16])
    return sizes, off0


def media_frames_oracle(n_assets: int = 200, seed: int = 42,
                        every_k: int = 8) -> pd.DataFrame:
    """Expected q_media_frames output: per video asset, the JVM sampling
    fan-out (frame_idx = 0, k, 2k, ... < n_frames) joined with per-frame
    stats read INDEPENDENTLY from the sample tables (flat stsz/stco scan
    + mdat slicing + crc32)."""
    import zlib

    from marie_ai_spark.operators.multimodal import gen_media_rows

    recs = []
    for aid, kind, payload, meta in gen_media_rows(n_assets, seed):
        if kind != "video":
            continue
        b = bytes(payload)
        sizes, off0 = _mp4_samples_flat(b)
        frames = []
        off = off0
        for sz in sizes:
            frames.append(b[off : off + sz])
            off += sz
        nf = meta["n_frames"]
        for pos, idx in enumerate(range(0, nf, every_k)):
            fb = frames[idx]
            recs.append(
                {
                    "asset_id": aid,
                    "n_frames": nf,
                    "sample_pos": pos,
                    "frame_idx": idx,
                    "frame_size": len(fb),
                    "mean_byte": round(sum(fb) / (len(fb) * 255.0), 6)
                    if fb
                    else 0.0,
                    "frame_crc": zlib.crc32(fb),
                }
            )
    out = pd.DataFrame(recs)
    for c in ("n_frames", "sample_pos", "frame_idx", "frame_size"):
        out[c] = out[c].astype("int32")
    out["frame_crc"] = out["frame_crc"].astype("int64")
    return out


def media_decode_oracle(n_assets: int = 200, seed: int = 42) -> pd.DataFrame:
    """Independent re-parse of the gen_media payload bytes — struct-level
    readers written against the format specs SEPARATELY from
    ref_ops/media.py, so the fixture is a second implementation, not a
    re-export of the operator's parser."""
    import struct
    import zlib

    from marie_ai_spark.operators.multimodal import _MAGIC, gen_media_rows

    recs = []
    for aid, kind, payload, _meta in gen_media_rows(n_assets, seed):
        b = bytes(payload)
        fmt = None
        w = h = nf = sr = 0
        mean = 0.0
        ok = True
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            fmt = "png"
            # IHDR is always the first chunk: fixed offsets per the spec
            w, h = struct.unpack(">II", b[16:24])
            nf = 1
            # collect IDAT chunks and inflate; filter byte 0 per scanline
            off, idat = 8, b""
            while off + 8 <= len(b):
                (ln,) = struct.unpack(">I", b[off : off + 4])
                typ = b[off + 4 : off + 8]
                if typ == b"IDAT":
                    idat += b[off + 8 : off + 8 + ln]
                off += 12 + ln
            raw = zlib.decompress(idat)
            pix = bytearray()
            for y in range(h):
                pix += raw[y * (w + 1) + 1 : (y + 1) * (w + 1)]
            mean = sum(pix) / (w * h * 255.0)
        elif b[:2] == b"\xff\xd8":
            fmt = "jpeg"
            off = 2
            while off < len(b) - 1:
                marker = b[off + 1]
                (ln,) = struct.unpack(">H", b[off + 2 : off + 4])
                if marker == 0xC0:
                    h, w = struct.unpack(">HH", b[off + 5 : off + 9])
                    break
                off += 2 + ln
            nf = 1
            # expected decoded-scan mean, derived INDEPENDENTLY of the
            # operator's Huffman decoder: Huffman coding is lossless, so
            # the decoded pixels equal IDCT(dequant(quant(FDCT(source))))
            # — recomputed here from the generator's source pixels with a
            # second implementation of the module's DCT bit-exactness
            # contract. A broken entropy roundtrip in the operator would
            # shift its mean and fail the hash gate.
            has_scan = b"\xff\xda" in b
            if has_scan:
                from marie_ai_spark.operators.multimodal import _pixels

                mean = _jpeg_pipeline_mean(_pixels(aid, w * h), w, h)
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            fmt = "gif"
            w, h = struct.unpack("<HH", b[6:10])
            nf = 1
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            fmt = "wav"
            off = 12
            data = b""
            while off + 8 <= len(b):
                cid = b[off : off + 4]
                (ln,) = struct.unpack("<I", b[off + 4 : off + 8])
                if cid == b"fmt ":
                    sr = struct.unpack("<I", b[off + 12 : off + 16])[0]
                elif cid == b"data":
                    data = b[off + 8 : off + 8 + ln]
                off += 8 + ln + (ln & 1)
            nf = len(data) // 2
            vals = struct.unpack(f"<{nf}h", data)
            mean = sum(abs(v) for v in vals) / (nf * 32768.0)
        elif len(b) >= 12 and b[4:8] == b"ftyp":
            fmt = "mp4"
            # independent flat scan for the mvhd/tkhd/stsz/stco payloads:
            # boxes are (size,type) framed, so locate the type tags and
            # read fixed offsets per the ISO BMFF layout (first occurrence
            # is always the moov copy — moov precedes mdat)
            i = b.find(b"mvhd")
            if i >= 0 and b[i + 4] == 0:
                _ts, nf = struct.unpack(">II", b[i + 16 : i + 24])
            j = b.find(b"tkhd")
            if j >= 0:
                (sz,) = struct.unpack(">I", b[j - 4 : j])
                w_fx, h_fx = struct.unpack(">II", b[j - 4 + sz - 8 : j - 4 + sz])
                w, h = w_fx >> 16, h_fx >> 16
            sizes, off0 = _mp4_samples_flat(b)
            if sizes:
                nf = len(sizes)
                payload_len = sum(sizes)
                mean = (
                    sum(b[off0 : off0 + payload_len]) / (payload_len * 255.0)
                    if payload_len
                    else 0.0
                )
        elif b.startswith(_MAGIC):
            fmt = "fake"
            w, h, nf = struct.unpack("<III", b[10:22])
            import hashlib as _hl

            mean = _hl.md5(b[22:]).digest()[0] / 255.0
        else:
            ok = False
        recs.append(
            {
                "asset_id": aid,
                "kind": kind,
                "format": fmt,
                "width": w,
                "height": h,
                "n_frames": nf,
                "sample_rate": sr,
                "mean_value": round(mean, 6),
                "ok": ok,
            }
        )
    out = pd.DataFrame(recs)
    for c in ("width", "height", "n_frames", "sample_rate"):
        out[c] = out[c].astype("int32")
    return out


def training_pipeline_oracle(df: pd.DataFrame) -> pd.DataFrame:
    """Pure-python twin of plans/training_pipeline.build_training_set over
    the ref_ops extraction: quality gate -> exact dedup (keep min key per
    fingerprint) -> MinHash-LSH candidates -> exact-Jaccard verify at 0.8
    -> drop doc_b -> tokenize -> chunk (512/64). Fully independent of the
    Spark execution path (only shared semantics modules)."""
    import hashlib
    import re as _re

    from marie_ai_spark.operators.tokenize import encode_text

    # 1. extraction (ref_ops)
    rows = []
    for row in df.itertuples():
        r = extract_turn(row.text)
        rows.append((row.conv_id, int(row.turn_idx), r["clean_text"]))

    # 2. quality gate
    def toks(t):
        t = t.strip()
        return t.split() if t else []

    quality = []
    for cid, tix, text in rows:
        w = toks(text)
        if len(text) < 20 or not w:
            continue
        stop = sum(1 for x in w if x.lower() in ("the", "a"))
        if stop / len(w) > 0.60:
            continue
        quality.append((cid, tix, text))

    # 3. exact dedup: keep the smallest (conv_id, turn_idx) per fingerprint
    def fp(t):
        return hashlib.md5(
            _re.sub(r"\s+", " ", t.strip()).lower().encode()
        ).hexdigest()

    keeper = {}
    for cid, tix, text in quality:
        k = fp(text)
        if k not in keeper or (cid, tix) < keeper[k][:2]:
            keeper[k] = (cid, tix, text)
    uniq = sorted(keeper.values())

    # 4. near dedup: minhash bands -> candidates -> exact jaccard >= 0.8
    def shingles(t):
        w = toks(t)
        return (
            {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
            if len(w) >= 3
            else set()
        )

    docs = {f"{cid}\x1f{tix}": shingles(text) for cid, tix, text in uniq}
    sigs = {}
    for d, sh in docs.items():
        if not sh:
            continue  # no shingles -> no signature row in the Spark plan
        hs = [
            min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
            for i in range(8)
        ]
        sigs[d] = [
            hashlib.md5(f"{hs[2 * b]}|{hs[2 * b + 1]}".encode()).hexdigest()
            for b in range(4)
        ]
    buckets = {}
    for d, bands in sigs.items():
        for b, s in enumerate(bands):
            buckets.setdefault((b, s), []).append(d)
    cands = set()
    for members in buckets.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cands.add((a, b))
    from decimal import ROUND_HALF_UP, Decimal

    losers = set()
    for a, b in cands:
        sa, sb = docs[a], docs[b]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if not union or not inter:
            continue  # no shared shingle -> no row in the verify join
        j = float(
            Decimal(repr(inter / union)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        if j >= 0.8:
            losers.add(b)

    # 5. tokenize + chunk (512/64)
    recs = []
    for cid, tix, text in uniq:
        if f"{cid}\x1f{tix}" in losers:
            continue
        ids = encode_text(text)
        if not ids:
            continue
        stride = 512 - 64
        last = max(len(ids) - 64 - 1, 0)
        starts = list(range(0, last + 1, stride))
        for ci, s in enumerate(starts):
            recs.append(
                {
                    "conv_id": cid,
                    "turn_idx": tix,
                    "chunk_idx": ci,
                    "chunk_len": len(ids[s : s + 512]),
                }
            )
    return pd.DataFrame(recs)


def main():
    os.makedirs(os.path.join(ROOT, "oracle"), exist_ok=True)
    tr = transcripts_df()
    tr[["conv_id", "turn_idx", "text"]].to_parquet(
        os.path.join(ROOT, "transcripts_c100_s42.parquet"), index=False
    )

    ex = extract_oracle(tr)
    ex[["conv_id", "turn_idx", "doc_kind", "clean_text", "n_lines"]].to_parquet(
        os.path.join(ROOT, "oracle", "extract_transcripts_c100.parquet"), index=False
    )
    continuation_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "extract_continuation_c100.parquet"), index=False
    )
    grid_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "extract_grid_c100.parquet"), index=False
    )
    rollup_oracle(ex).to_parquet(
        os.path.join(ROOT, "oracle", "conversation_rollup_c100.parquet"), index=False
    )
    span_regions_oracle(ex).to_parquet(
        os.path.join(ROOT, "oracle", "span_regions_c100.parquet"), index=False
    )
    multiline_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "multiline_blocks_c100.parquet"), index=False
    )
    hybrid_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "hybrid_annotate_c100.parquet"), index=False
    )
    adlib_pages_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "adlib_pages_c100.parquet"), index=False
    )
    adlib_summary_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "adlib_summary_c100.parquet"), index=False
    )
    blobs_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "serialize_blobs_c100.parquet"), index=False
    )
    merge_iou_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "merge_iou_c100.parquet"), index=False
    )
    merge_horizontal_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "merge_horizontal_c100.parquet"), index=False
    )
    training_pipeline_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "training_pipeline_c100.parquet"), index=False
    )
    region_tables_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "region_tables_c100.parquet"), index=False
    )
    region_table_footers_oracle(tr).to_parquet(
        os.path.join(ROOT, "oracle", "region_table_footers_c100.parquet"), index=False
    )
    section_tables_oracle(200, 42).to_parquet(
        os.path.join(ROOT, "oracle", "section_tables_d200.parquet"), index=False
    )
    media_decode_oracle(200, 42).to_parquet(
        os.path.join(ROOT, "oracle", "media_decode_a200.parquet"), index=False
    )
    media_frames_oracle(200, 42, 8).to_parquet(
        os.path.join(ROOT, "oracle", "media_frames_a200.parquet"), index=False
    )
    scrub_pii_oracle(300, 42).to_parquet(
        os.path.join(ROOT, "oracle", "scrub_pii_d300.parquet"), index=False
    )
    for f in sorted(os.listdir(os.path.join(ROOT, "oracle"))):
        print("wrote", f)
    print("wrote transcripts_c100_s42.parquet rows=", len(tr))


if __name__ == "__main__":
    main()
