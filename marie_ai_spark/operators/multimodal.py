"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (per the project brief): media payloads are `binary` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched `mapInPandas` stages. The image/audio codec libraries are
NOT available in this container, so the codec step is stubbed: payloads
produced by `gen_media` carry a small self-describing header that the stub
"decodes" deterministically, and real payloads raise NotImplementedError
with a clear message. Everything Spark-side — schemas, batch shapes,
partitioning, the UDF signatures — is real and tested, so swapping the
stub for PIL/torchaudio/pyav is a one-function change.

The dataflow mirrors the reference's GPU stages (SURVEY.md §2.8): batched,
stateless maps over assets, one Arrow batch at a time.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "asset_id string, kind string, payload binary, "
    "meta struct<width:int,height:int,sample_rate:int,n_frames:int,mime:string>"
)

_MAGIC = b"FAKEMEDIA1"


def _fake_payload(asset_id: str, kind: str, width: int, height: int,
                  n_frames: int) -> bytes:
    body = hashlib.md5(f"{asset_id}:{kind}".encode()).digest() * 4
    return _MAGIC + _struct.pack("<III", width, height, n_frames) + body


def gen_media(spark, n_assets: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_assets):
        kind = kinds[i % 3]
        w, h = 64 + (i % 8) * 32, 64 + (i % 5) * 32
        frames = 1 if kind == "image" else 16 + i % 32
        rows.append(
            (
                f"asset-{seed}-{i:06d}",
                kind,
                _fake_payload(f"asset-{seed}-{i:06d}", kind, w, h, frames),
                {
                    "width": w if kind != "audio" else 0,
                    "height": h if kind != "audio" else 0,
                    "sample_rate": 16000 if kind == "audio" else 0,
                    "n_frames": frames,
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes):
    """Stubbed codec: decodes only the synthetic header. Real media →
    NotImplementedError (the marked seam for PIL/pyav)."""
    if payload is None or not bytes(payload).startswith(_MAGIC):
        raise NotImplementedError(
            "real media decode requires an image/audio codec library "
            "(PIL/pyav), not available in this environment"
        )
    b = bytes(payload)
    off = len(_MAGIC)
    width, height, n_frames = _struct.unpack("<III", b[off : off + 12])
    digest = hashlib.md5(b[off + 12 :]).digest()
    mean_px = digest[0] / 255.0
    return width, height, n_frames, mean_px


DECODED_SCHEMA = (
    "asset_id string, kind string, width int, height int, n_frames int, "
    "mean_pixel double, ok boolean"
)


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: per asset, header fields + a content
    statistic. Errors per asset are captured, not thrown (ok=false)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "kind": [], "width": [], "height": [],
                   "n_frames": [], "mean_pixel": [], "ok": []}
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    w, h, nf, mp = _decode_stub(payload)
                    ok = True
                except NotImplementedError:
                    w = h = nf = 0
                    mp = 0.0
                    ok = False
                out["asset_id"].append(aid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["mean_pixel"].append(round(mp, 6))
                out["ok"].append(ok)
            res = pd.DataFrame(out)
            res["width"] = res["width"].astype("int32")
            res["height"] = res["height"].astype("int32")
            res["n_frames"] = res["n_frames"].astype("int32")
            yield res

    return media.select("asset_id", "kind", "payload").mapInPandas(
        fn, schema=DECODED_SCHEMA
    )


EMBED_DIM = 16


def media_embeddings(media: DataFrame) -> DataFrame:
    """Feature-extraction stage: deterministic pseudo-embedding per asset
    (md5-expanded payload bytes -> EMBED_DIM floats in [-1, 1)). The real
    model call replaces only the inner loop; the Arrow batch shape and the
    array<float> output column are the production contract."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                vec = []
                for i in range(EMBED_DIM):
                    h = hashlib.md5(b + bytes([i])).digest()
                    vec.append(
                        round(int.from_bytes(h[:4], "big") / (1 << 31) - 1.0, 6)
                    )
                embs.append(vec)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"].values, "embedding": embs}
            )

    return media.select("asset_id", "payload").mapInPandas(
        fn, schema="asset_id string, embedding array<float>"
    )


def sample_frames(media: DataFrame, every_k: int = 8) -> DataFrame:
    """Frame sampling for video assets: JVM-side index fan-out (sequence +
    posexplode) — the per-frame decode would consume (asset_id, frame_idx)
    downstream; no Python needed to plan the sampling."""
    video = media.filter(F.col("kind") == "video")
    idxs = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_k)
    )
    return video.select(
        "asset_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.posexplode(idxs).alias("sample_pos", "frame_idx"),
    )
