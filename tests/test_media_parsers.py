"""Property tests for the dependency-free media container readers:
generate -> parse round trips must recover dimensions and content
statistics exactly (pure python, no Spark session needed)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from marie_ai_spark.ref_ops import media as m


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 64),
    h=st.integers(1, 64),
    data=st.data(),
)
def test_png_roundtrip(w, h, data):
    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    b = m.png_bytes(w, h, pix)
    r = m.parse_png(b)
    assert (r["width"], r["height"], r["format"]) == (w, h, "png")
    assert r["mean_pixel"] == sum(pix) / (w * h * 255.0)


@settings(max_examples=50, deadline=None)
@given(w=st.integers(1, 65535), h=st.integers(1, 65535))
def test_jpeg_roundtrip(w, h):
    r = m.parse_jpeg(m.jpeg_bytes(w, h))
    assert (r["width"], r["height"], r["format"]) == (w, h, "jpeg")


@settings(max_examples=50, deadline=None)
@given(w=st.integers(0, 65535), h=st.integers(0, 65535))
def test_gif_roundtrip(w, h):
    r = m.parse_gif(m.gif_bytes(w, h))
    assert (r["width"], r["height"], r["format"]) == (w, h, "gif")


@settings(max_examples=50, deadline=None)
@given(
    rate=st.integers(1, 192000),
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=512),
)
def test_wav_roundtrip(rate, samples):
    r = m.parse_wav(m.wav_bytes(rate, samples))
    assert r["format"] == "wav"
    assert r["sample_rate"] == rate
    assert r["n_samples"] == len(samples)
    assert r["channels"] == 1 and r["bits"] == 16
    assert r["mean_amplitude"] == sum(abs(v) for v in samples) / (
        len(samples) * 32768.0
    )


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 4096),
    h=st.integers(1, 4096),
    frames=st.integers(1, 100000),
)
def test_mp4_roundtrip(w, h, frames):
    r = m.parse_mp4(m.mp4_bytes(w, h, frames))
    assert (r["width"], r["height"], r["format"]) == (w, h, "mp4")
    assert r["duration"] == frames and r["timescale"] == 24
    assert r["brand"] == "isom"


def test_sniff_rejects_garbage():
    for b in (b"", b"hello", b"\x89PNGxx", b"RIFFxxxxNOPE"):
        assert m.sniff_format(b) is None


def _dct_pipeline_mean(pix: bytes, w: int, h: int) -> float:
    """Expected decoded mean via the lossless-Huffman shortcut: decoded
    pixels == IDCT(dequant(quant(FDCT(source)))) with edge replication."""
    total = 0
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            blk = [0] * 64
            for y in range(8):
                yy = min(by * 8 + y, h - 1)
                for x in range(8):
                    blk[y * 8 + x] = pix[yy * w + min(bx * 8 + x, w - 1)] - 128
            dec = m.dequant_idct(
                m.fdct_quant(blk, m.STD_LUMA_QUANT), m.STD_LUMA_QUANT
            )
            for y in range(8):
                if by * 8 + y >= h:
                    break
                for x in range(8):
                    if bx * 8 + x < w:
                        total += dec[y * 8 + x]
    return total / (w * h * 255.0)


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 24), h=st.integers(1, 24), data=st.data())
def test_jpeg_entropy_roundtrip(w, h, data):
    """Full baseline encode -> Huffman/IDCT decode recovers the exact
    DCT-pipeline pixels (entropy coding is lossless)."""
    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    r = m.parse_jpeg(m.jpeg_bytes(w, h, pix))
    assert (r["width"], r["height"], r["format"]) == (w, h, "jpeg")
    assert r["mean_pixel"] == _dct_pipeline_mean(pix, w, h)


def test_jpeg_restart_interval_falls_back_to_header_facts():
    """A baseline JPEG using restart intervals (DRI segment / RST markers)
    must NOT raise from the bit reader — it returns header facts with
    mean 0.0, the documented fallback contract (ADVICE r4). Covers both
    the DRI-segment gate and the RST-in-scan gate independently."""
    w = h = 16
    pix = bytes(range(w)) * h
    b = m.jpeg_bytes(w, h, pix)
    assert m.parse_jpeg(b)["mean_pixel"] > 0.0  # decodable without DRI

    # insert a DRI segment (FF DD 00 04 <interval=4>) right after SOI
    with_dri = b[:2] + bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x04]) + b[2:]
    r = m.parse_jpeg(with_dri)
    assert (r["width"], r["height"], r["mean_pixel"]) == (w, h, 0.0)

    # splice a bare RST0 marker into the scan (no DRI): still fallback,
    # never a ValueError from inside the entropy decoder
    sos = b.find(bytes([0xFF, 0xDA]))
    (seg_len,) = __import__("struct").unpack(">H", b[sos + 2 : sos + 4])
    mid = sos + 2 + seg_len + 8
    with_rst = b[:mid] + bytes([0xFF, 0xD0]) + b[mid:]
    r2 = m.parse_jpeg(with_rst)
    assert (r2["width"], r2["height"], r2["mean_pixel"]) == (w, h, 0.0)


def test_jpeg_decode_tracks_source():
    """Quantization error is bounded: smooth gradients decode close to the
    source (sanity that the DCT chain is a real image transform, not just
    self-consistent)."""
    w = h = 16
    pix = bytes((x * 8 + y * 4) % 256 for y in range(h) for x in range(w))
    r = m.parse_jpeg(m.jpeg_bytes(w, h, pix))
    src_mean = sum(pix) / (w * h * 255.0)
    assert abs(r["mean_pixel"] - src_mean) < 0.02


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 1024),
    h=st.integers(1, 1024),
    data=st.data(),
)
def test_mp4_frames_roundtrip(w, h, data):
    frames = [
        bytes(fr)
        for fr in data.draw(
            st.lists(
                st.lists(st.integers(0, 255), min_size=0, max_size=64),
                min_size=1,
                max_size=20,
            )
        )
    ]
    b = m.mp4_bytes(w, h, len(frames), frames=frames)
    r = m.parse_mp4(b)
    assert r["n_samples"] == len(frames)
    assert r["sample_sizes"] == [len(f) for f in frames]
    assert m.mp4_frames(b) == frames
