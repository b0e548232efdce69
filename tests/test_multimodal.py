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
