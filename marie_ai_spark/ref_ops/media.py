"""Dependency-free media container parsing (the real-codec seam, now real
for headers and simple payloads).

Pure-python, stdlib-only readers for the formats the corpus generator
emits; no PIL/pyav. What is REAL here:
  - PNG: signature + IHDR (width/height/bit depth/color type), and a full
    pixel decode for the 8-bit grayscale / filter-0 images the generator
    writes (zlib IDAT inflate + per-scanline filter strip) -> real mean
    pixel statistic.
  - JPEG: marker walk to the first SOF frame header -> width/height.
  - GIF: 87a/89a logical screen descriptor -> width/height.
  - WAV: RIFF/fmt/data chunk walk -> sample rate, channels, bit depth,
    sample count, and a real mean |amplitude| over the PCM16 payload.
What remains stubbed (documented seam): video codecs (mp4/h264 entropy
decode needs a real library); synthetic video payloads carry the
FAKEMEDIA1 header and are decoded by the stub.

Mirrors the decode/feature stage of the reference's asset pipeline
(SURVEY.md §2.8); the Spark-side contract is operators/multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def sniff_format(b: bytes) -> str | None:
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if b.startswith(b"\xff\xd8"):
        return "jpeg"
    if b.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
        return "wav"
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return "mp4"
    return None


def parse_png(b: bytes) -> dict:
    """IHDR fields; pixels decoded for 8-bit grayscale filter-0 images."""
    if not b.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    off = 8
    width = height = None
    bit_depth = color_type = None
    idat = b""
    while off + 8 <= len(b):
        (length,) = struct.unpack(">I", b[off : off + 4])
        typ = b[off + 4 : off + 8]
        data = b[off + 8 : off + 8 + length]
        if typ == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", data[:10]
            )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        off += 12 + length  # len + type + data + crc
    if width is None:
        raise ValueError("PNG without IHDR")
    out = {
        "format": "png",
        "width": int(width),
        "height": int(height),
        "mean_pixel": 0.0,
    }
    if bit_depth == 8 and color_type == 0 and idat:
        raw = zlib.decompress(idat)
        stride = width + 1  # 1 filter byte per scanline
        total = 0
        for y in range(height):
            row = raw[y * stride : (y + 1) * stride]
            if row[0] != 0:  # only filter 0 (None) is decodable here
                return out
            total += sum(row[1:])
        out["mean_pixel"] = total / (width * height * 255.0)
    return out


def parse_jpeg(b: bytes) -> dict:
    """Walk the marker stream to the first SOF frame header."""
    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    off = 2
    while off + 4 <= len(b):
        if b[off] != 0xFF:
            off += 1
            continue
        marker = b[off + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:  # standalone markers
            off += 2
            continue
        (seg_len,) = struct.unpack(">H", b[off + 2 : off + 4])
        if marker in _SOF_MARKERS:
            precision, height, width = struct.unpack(
                ">BHH", b[off + 4 : off + 9]
            )
            return {
                "format": "jpeg",
                "width": int(width),
                "height": int(height),
                "mean_pixel": 0.0,  # entropy decode needs a real codec
            }
        off += 2 + seg_len
    raise ValueError("JPEG without SOF header")


def parse_gif(b: bytes) -> dict:
    if not b.startswith((b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", b[6:10])
    return {
        "format": "gif",
        "width": int(width),
        "height": int(height),
        "mean_pixel": 0.0,  # LZW decode needs a real codec
    }


def parse_wav(b: bytes) -> dict:
    """RIFF chunk walk: fmt (PCM only) + data; real PCM16 amplitude mean."""
    if not (b.startswith(b"RIFF") and b[8:12] == b"WAVE"):
        raise ValueError("not a WAV")
    off = 12
    rate = channels = bits = 0
    data = b""
    while off + 8 <= len(b):
        cid = b[off : off + 4]
        (clen,) = struct.unpack("<I", b[off + 4 : off + 8])
        body = b[off + 8 : off + 8 + clen]
        if cid == b"fmt ":
            _fmt, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            data = body
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    n_samples = len(data) // max((bits // 8) * max(channels, 1), 1)
    mean_amp = 0.0
    if bits == 16 and n_samples:
        vals = struct.unpack(f"<{n_samples * max(channels,1)}h", data)
        mean_amp = sum(abs(v) for v in vals) / (len(vals) * 32768.0)
    return {
        "format": "wav",
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_samples": int(n_samples),
        "mean_amplitude": mean_amp,
    }


def _walk_boxes(b: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack(">I", b[off : off + 4])
        typ = b[off + 4 : off + 8]
        if size < 8:
            break
        yield typ, off + 8, min(off + size, end)
        off += size


def parse_mp4(b: bytes) -> dict:
    """ISO BMFF box walk: ftyp brand, moov>mvhd (timescale/duration),
    moov>trak>tkhd (16.16 fixed-point width/height). Sample-table entropy
    decode (actual frames) still needs a real codec; the header facts here
    are parsed from the real box structure."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an MP4")
    brand = b[8:12].decode("ascii", "replace")
    timescale = duration = 0
    width = height = 0
    for typ, s, e in _walk_boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in _walk_boxes(b, s, e):
            if t2 == b"mvhd":
                ver = b[s2]
                if ver == 0:
                    timescale, duration = struct.unpack(
                        ">II", b[s2 + 12 : s2 + 20]
                    )
                else:  # version 1: 64-bit times
                    (timescale,) = struct.unpack(">I", b[s2 + 20 : s2 + 24])
                    (duration,) = struct.unpack(">Q", b[s2 + 24 : s2 + 32])
            elif t2 == b"trak":
                for t3, s3, e3 in _walk_boxes(b, s2, e2):
                    if t3 == b"tkhd" and b[s3] == 0:
                        w_fx, h_fx = struct.unpack(">II", b[e3 - 8 : e3])
                        width, height = w_fx >> 16, h_fx >> 16
    return {
        "format": "mp4",
        "brand": brand,
        "timescale": int(timescale),
        "duration": int(duration),
        "duration_sec": (duration / timescale) if timescale else 0.0,
        "width": int(width),
        "height": int(height),
    }


# ------------------------------------------------------------ generators
# Deterministic, fully-valid minimal files (pure functions of their args).


def png_bytes(width: int, height: int, pix: bytes) -> bytes:
    """A complete, spec-valid 8-bit grayscale PNG (filter 0, real CRCs)."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pix[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def jpeg_bytes(width: int, height: int) -> bytes:
    """SOI + JFIF APP0 + SOF0 + EOI: a structurally valid JPEG marker
    stream carrying real dimensions (no entropy-coded scan)."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )


def gif_bytes(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return (
        b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"
    )


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def mp4_bytes(width: int, height: int, n_frames: int, timescale: int = 24) -> bytes:
    """A minimal valid ISO BMFF file: ftyp(isom) + moov(mvhd + trak(tkhd)).
    Encoded at 1 duration unit per frame (timescale=24 <=> 24 fps), so
    mvhd duration == frame count — the parser derives frames from real
    header fields, no side channel."""
    mvhd = (
        b"\x00\x00\x00\x00"              # version 0 + flags
        + struct.pack(">II", 0, 0)        # creation/modification time
        + struct.pack(">II", timescale, n_frames)
        + struct.pack(">I", 0x00010000)   # rate 1.0
        + b"\x00" * 76                    # volume/reserved/matrix/next_track
    )
    tkhd = (
        b"\x00\x00\x00\x07"              # version 0 + enabled flags
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)            # track id
        + b"\x00" * 60                    # reserved/duration/matrix
        + struct.pack(">II", width << 16, height << 16)  # 16.16 fixed
    )
    moov = _box(b"moov", _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd)))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    return ftyp + moov


def wav_bytes(sample_rate: int, samples: list[int]) -> bytes:
    """A complete valid mono PCM16 WAV."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body
