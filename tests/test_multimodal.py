"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic stub
decode, frame sampling fan-out."""

import pytest

from pyspark.sql import functions as F

from marie_ai_spark.operators.multimodal import (
    EMBED_DIM,
    decode_media,
    gen_media,
    media_embeddings,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return gen_media(spark, n_assets=60, seed=9).cache()


def test_media_schema_and_kinds(media):
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_deterministic(spark, media):
    d1 = decode_media(media).toPandas().sort_values("asset_id")
    d2 = decode_media(media).toPandas().sort_values("asset_id")
    assert (d1.values == d2.values).all()
    assert d1.ok.all()
    img = d1[d1.kind == "image"]
    assert (img.n_frames == 1).all()
    # jpegs are generated at quarter scale (pure-python FDCT cost)
    assert img[img.format != "jpeg"].width.between(64, 320).all()
    assert img[img.format == "jpeg"].width.between(16, 80).all()
    # real container formats round-trip: dims from the actual headers
    assert set(img.format) == {"png", "jpeg", "gif"}
    aud = d1[d1.kind == "audio"]
    assert (aud.format == "wav").all() and (aud.sample_rate == 16000).all()
    assert (aud.mean_value > 0).all()  # real PCM16 decode
    vid = d1[d1.kind == "video"]
    assert (vid.format == "mp4").all()  # real ISO BMFF header parse
    assert (vid.width > 0).all() and (vid.n_frames >= 16).all()
    assert (vid.mean_value > 0).all()  # real mdat frame payload stats
    png = img[img.format == "png"]
    assert (png.mean_value > 0).all()  # real pixel decode
    jpg = img[img.format == "jpeg"]
    assert (jpg.mean_value > 0).all()  # real entropy-coded scan decode


def test_png_roundtrip_real_decode(spark):
    """A pixel-exact round trip: generate a PNG with known content, decode
    it through the Spark stage, and check the true mean."""
    from marie_ai_spark.ref_ops.media import png_bytes

    pix = bytes(range(16)) * 16  # 16x16, mean = 7.5/255
    sdf = spark.createDataFrame(
        [("p", "image", bytearray(png_bytes(16, 16, pix)),
          {"width": 16, "height": 16, "sample_rate": 0, "n_frames": 1,
           "mime": "image/png"})],
        "asset_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,mime:string>",
    )
    (row,) = decode_media(sdf).collect()
    assert (row.width, row.height, row.format, row.ok) == (16, 16, "png", True)
    assert row.mean_value == round(7.5 / 255.0, 6)


def test_decode_real_media_is_marked_stub(spark):
    fake_real = spark.createDataFrame(
        [("x", "image", bytearray(b"\x89PNG\r\n..."),
          {"width": 1, "height": 1, "sample_rate": 0, "n_frames": 1,
           "mime": "image/png"})],
        "asset_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,mime:string>",
    )
    out = decode_media(fake_real).collect()
    assert out[0].ok is False  # NotImplementedError captured per-asset


def test_media_embeddings_shape(media):
    emb = media_embeddings(media)
    rows = emb.collect()
    assert len(rows) == media.count()
    assert all(len(r.embedding) == EMBED_DIM for r in rows)
    assert all(-1.0 <= v < 1.0 for r in rows for v in r.embedding)


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_k=8)
    pdf = frames.toPandas()
    assert (pdf.frame_idx % 8 == 0).all()
    per_asset = pdf.groupby("asset_id").agg(
        n=("frame_idx", "size"), nf=("n_frames", "first")
    )
    for _, row in per_asset.iterrows():
        assert row.n == (row.nf - 1) // 8 + 1
    # only videos fan out
    kinds = media.filter(F.col("kind") != "video").select("asset_id").collect()
    assert not set(r.asset_id for r in kinds) & set(pdf.asset_id)


def test_extract_frames_real_payloads(spark, media):
    """Per-frame extraction reads the REAL sample tables: every video
    frame comes back with its exact 64-byte payload stats, matching an
    independent python slice of the same bytes."""
    import zlib

    from marie_ai_spark.operators.multimodal import extract_frames
    from marie_ai_spark.ref_ops.media import mp4_frames

    got = {
        (r.asset_id, r.frame_idx): (r.frame_size, r.mean_byte, r.frame_crc)
        for r in extract_frames(media).collect()
    }
    want = {}
    for r in media.filter(F.col("kind") == "video").collect():
        for i, fb in enumerate(mp4_frames(bytes(r.payload))):
            want[(r.asset_id, i)] = (
                len(fb), round(sum(fb) / (len(fb) * 255.0), 6), zlib.crc32(fb)
            )
    assert len(want) > 100
    assert got == want


def test_corrupt_payloads_degrade_per_asset(spark):
    """Real-world media is hostile: truncated or lying payloads must come
    back ok=false (or contribute zero frames) WITHOUT failing the Spark
    stage or affecting sibling assets in the same Arrow batch."""
    from marie_ai_spark.ref_ops.media import (
        jpeg_bytes,
        mp4_bytes,
        png_bytes,
        wav_bytes,
    )

    good_png = png_bytes(8, 8, bytes(range(64)))
    cases = [
        ("ok-png", "image", good_png),
        # PNG truncated mid-IDAT: zlib.error territory
        ("bad-png-trunc", "image", good_png[: len(good_png) - 20]),
        # JPEG cut inside the entropy-coded scan: bit reader runs dry
        ("bad-jpeg-trunc", "image",
         jpeg_bytes(8, 8, bytes(range(64)))[:-12]),
        # WAV truncated to an ODD payload length: struct.unpack of the
        # sample array raises struct.error (an even truncation decodes
        # gracefully as fewer samples — also covered below)
        ("bad-wav-lie", "audio",
         wav_bytes(16000, [1, 2, 3])[:-1]),
        ("short-wav-graceful", "audio",
         wav_bytes(16000, [1, 2, 3])[:-2]),
        # MP4 whose stsz promises frames beyond EOF
        ("bad-mp4-lie", "video",
         mp4_bytes(16, 16, 3, frames=[b"abc", b"def", b"ghi"])[:-6]),
        ("empty", "image", b""),
    ]
    sdf = spark.createDataFrame(
        [(aid, kind, bytearray(b),
          {"width": 8, "height": 8, "sample_rate": 0, "n_frames": 3,
           "mime": "x"})
         for aid, kind, b in cases],
        "asset_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,mime:string>",
    )
    out = {r.asset_id: r for r in decode_media(sdf).collect()}
    assert len(out) == len(cases)          # the stage survived every asset
    assert out["ok-png"].ok is True
    assert out["ok-png"].mean_value > 0
    assert out["empty"].ok is False
    # per-asset capture: every corrupt asset either fails cleanly
    # (ok=false) or degrades to header-only facts — never an exception
    for aid in ("bad-png-trunc", "bad-jpeg-trunc", "bad-wav-lie"):
        r = out[aid]
        assert r.ok is False or r.mean_value == 0.0, aid
    # graceful degradations (never an exception): an even WAV truncation
    # decodes as fewer samples; an MP4 whose stsz points past EOF keeps
    # its header facts and stats over the bytes that exist
    assert out["short-wav-graceful"].ok is True
    assert out["short-wav-graceful"].n_frames == 2
    assert out["bad-mp4-lie"].ok is True
    assert out["bad-mp4-lie"].n_frames == 3

    # frame extraction over the lying MP4: no crash, no phantom frames
    # beyond the payload
    from marie_ai_spark.operators.multimodal import extract_frames

    frames = extract_frames(sdf).collect()
    assert all(r.frame_size >= 0 for r in frames)
