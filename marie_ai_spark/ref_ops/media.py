"""Dependency-free media container parsing (the real-codec seam, now real
end-to-end for the corpus formats).

Pure-python, stdlib-only readers for the formats the corpus generator
emits; no PIL/pyav. What is REAL here:
  - PNG: signature + IHDR (width/height/bit depth/color type), and a full
    pixel decode for the 8-bit grayscale / filter-0 images the generator
    writes (zlib IDAT inflate + per-scanline filter strip) -> real mean
    pixel statistic.
  - JPEG: full BASELINE GRAYSCALE codec — the encoder emits real
    DQT/SOF0/DHT/SOS segments with an entropy-coded scan (FDCT, standard
    Annex-K luminance quant + Huffman tables), and the parser Huffman-
    decodes the scan, dequantizes, runs the IDCT and reports the true
    decoded pixel mean. Multi-component / progressive streams fall back
    to header facts (the remaining external-codec seam).
  - GIF: 87a/89a logical screen descriptor -> width/height.
  - WAV: RIFF/fmt/data chunk walk -> sample rate, channels, bit depth,
    sample count, and a real mean |amplitude| over the PCM16 payload.
  - MP4: ISO BMFF box walk incl. the sample tables (stsd/stts/stsc/stsz/
    stco) — per-frame byte extraction from mdat is real; only a real
    video codec's entropy decode (h264 etc.) remains external.

DCT bit-exactness contract (shared with the independent fixture twin in
tools/make_fixtures.py): float64 arithmetic, separable 8x8 transforms with
ASCENDING index accumulation — FDCT computes t[v][x] = sum_y s[y][x]*ct[v][y]
then S[v][u] = 0.25*(a[u]*a[v])*sum_x t[v][x]*ct[u][x]; IDCT computes
tt[v][x] = sum_u (a[u]*R[v][u])*ct[u][x] then 0.25*sum_v (a[v]*tt[v][x])*ct[v][y];
quantization rounds half away from zero, pixels round half-up after the
+128 level shift and clamp to [0, 255]. Two independent implementations of
this spec produce bit-identical float64 results, so the oracle fixture can
verify the entropy-coded roundtrip without sharing code.

Mirrors the decode/feature stage of the reference's asset pipeline
(SURVEY.md §2.8; DCTDecode filter handling marie/utils/docs.py:53-75); the
Spark-side contract is operators/multimodal.py.
"""

from __future__ import annotations

import math
import struct
import zlib

_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}

# ------------------------------------------------------- JPEG baseline codec
# Standard tables from ITU-T T.81 Annex K (public spec): luminance quant
# table (K.1), luminance DC/AC Huffman BITS+HUFFVAL (K.3). Any
# self-consistent tables round-trip (they travel in DQT/DHT); the standard
# ones keep the files realistic.

STD_LUMA_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # 1-indexed
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

_CT = [[math.cos((2 * x + 1) * k * math.pi / 16) for x in range(8)]
       for k in range(8)]
_ALPHA = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _huff_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 C.2): codes of ascending
    length, incrementing; returns {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits, vals):
    """{(code, length): symbol} for the bit-at-a-time reader."""
    return {(c, ln): sym for sym, (c, ln) in _huff_codes(bits, vals).items()}


def _round_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def fdct_quant(block, quant):
    """8x8 level-shifted spatial block (row-major s[y][x], ints already
    -128..127) -> quantized coefficients R[v][u] (row-major 64-list),
    per the module's bit-exactness contract."""
    t = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        for x in range(8):
            acc = 0.0
            for y in range(8):
                acc += block[y * 8 + x] * _CT[v][y]
            t[v][x] = acc
    out = [0] * 64
    for v in range(8):
        for u in range(8):
            acc = 0.0
            for x in range(8):
                acc += t[v][x] * _CT[u][x]
            s = 0.25 * (_ALPHA[u] * _ALPHA[v]) * acc
            out[v * 8 + u] = _round_away(s / quant[v * 8 + u])
    return out


def dequant_idct(coefs, quant):
    """Quantized coefficients (row-major R[v][u]) -> 8x8 pixel block
    (row-major, 0..255 ints), per the module's bit-exactness contract."""
    r = [coefs[i] * quant[i] for i in range(64)]
    tt = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                acc += (_ALPHA[u] * r[v * 8 + u]) * _CT[u][x]
            tt[v][x] = acc
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                acc += (_ALPHA[v] * tt[v][x]) * _CT[v][y]
            val = 0.25 * acc + 128.0
            p = int(math.floor(val + 0.5))
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        while self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, table: dict) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((code, ln))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map the `size`-bit magnitude to the signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _mag_bits(v: int) -> tuple[int, int]:
    """Signed value -> (size, appended magnitude bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


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
    """Baseline JPEG decode: marker walk collecting DQT/DHT/SOF0/SOS, then
    a full Huffman + dequant + IDCT pass over the entropy-coded scan for
    single-component (grayscale) baseline streams -> true decoded pixel
    mean. Progressive / multi-component streams return header facts with
    mean 0.0 (the remaining external-codec seam); a stream with no SOS at
    all (bare header files) likewise. Streams using restart intervals
    (a DRI segment, or RST markers inside the scan) also fall back to
    header facts: the entropy decoder here has no restart handling, and
    without this gate a real restart-interval baseline JPEG would raise
    from the bit reader and lose width/height entirely (ADVICE r4)."""
    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    off = 2
    width = height = None
    sof_marker = None
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan = None
    scan_tables = None  # (dc table id, ac table id) of the single component
    dri_seen = False  # restart intervals -> header-facts fallback
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
        seg = b[off + 4 : off + 2 + seg_len]
        if marker in _SOF_MARKERS:
            sof_marker = marker
            _prec, height, width = struct.unpack(">BHH", seg[:5])
            n_comp = seg[5]
            comps = [
                (seg[6 + 3 * i], seg[8 + 3 * i]) for i in range(n_comp)
            ]
        elif marker == 0xDB:  # DQT (8-bit tables only)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    zz = list(seg[p : p + 64])
                    tbl = [0] * 64
                    for i, rast in enumerate(ZIGZAG):
                        tbl[rast] = zz[i]
                    quant[tq] = tbl
                    p += 64
                else:
                    p += 128
        elif marker == 0xDD:  # DRI: restart interval defined
            dri_seen = True
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _huff_decode_map(bits, vals)
                p += 17 + nv
        elif marker == 0xDA:  # SOS: scan follows until the next marker
            ns = seg[0]
            if ns == 1:
                scan_tables = (seg[2] >> 4, seg[2] & 0xF)
            scan_start = off + 2 + seg_len
            # scan runs to EOI; stuffed FF 00 stays inside
            p = scan_start
            while p + 1 < len(b):
                if b[p] == 0xFF and b[p + 1] not in (0x00,) and not (
                    0xD0 <= b[p + 1] <= 0xD7
                ):
                    break
                p += 1
            scan = b[scan_start:p]
            off = p
            continue
        off += 2 + seg_len
    if width is None:
        raise ValueError("JPEG without SOF header")
    out = {
        "format": "jpeg",
        "width": int(width),
        "height": int(height),
        "mean_pixel": 0.0,
    }
    has_rst = scan is not None and any(
        scan.find(bytes([0xFF, m])) != -1 for m in range(0xD0, 0xD8)
    )
    decodable = (
        sof_marker in (0xC0, 0xC1)
        and not dri_seen
        and not has_rst
        and scan is not None
        and scan_tables is not None
        and len(comps) == 1
        and comps[0][1] in quant
        and (0, scan_tables[0]) in huff
        and (1, scan_tables[1]) in huff
    )
    if not decodable:
        return out
    q = quant[comps[0][1]]
    dc_map = huff[(0, scan_tables[0])]
    ac_map = huff[(1, scan_tables[1])]
    reader = _BitReader(scan)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    pred = 0
    total = 0
    for by in range(bh):
        for bx in range(bw):
            coefs = [0] * 64
            size = reader.symbol(dc_map)
            pred += _extend(reader.bits(size), size)
            coefs[0] = pred
            kk = 1
            while kk < 64:
                rs = reader.symbol(ac_map)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        kk += 16  # ZRL
                        continue
                    break  # EOB
                kk += r
                if kk > 63:
                    raise ValueError("AC run past end of block")
                coefs[ZIGZAG[kk]] = _extend(reader.bits(s), s)
                kk += 1
            pix = dequant_idct(coefs, q)
            # accumulate only in-image pixels (edge blocks are padded)
            for y in range(8):
                yy = by * 8 + y
                if yy >= height:
                    break
                for x in range(8):
                    if bx * 8 + x < width:
                        total += pix[y * 8 + x]
    out["mean_pixel"] = total / (width * height * 255.0)
    return out


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


def _parse_stbl(b: bytes, s: int, e: int) -> tuple[list[int], int]:
    """(sample sizes from stsz, first chunk offset from stco)."""
    sizes: list[int] = []
    offset = 0
    for t, s2, _e2 in _walk_boxes(b, s, e):
        if t == b"stsz":
            fixed, count = struct.unpack(">II", b[s2 + 4 : s2 + 12])
            if fixed:
                sizes = [fixed] * count
            else:
                sizes = [
                    struct.unpack(">I", b[s2 + 12 + 4 * i : s2 + 16 + 4 * i])[0]
                    for i in range(count)
                ]
        elif t == b"stco":
            (n_chunks,) = struct.unpack(">I", b[s2 + 4 : s2 + 8])
            if n_chunks >= 1:
                (offset,) = struct.unpack(">I", b[s2 + 8 : s2 + 12])
    return sizes, offset


def parse_mp4(b: bytes) -> dict:
    """ISO BMFF box walk: ftyp brand, moov>mvhd (timescale/duration),
    moov>trak>tkhd (16.16 fixed-point width/height), and the sample
    tables moov>trak>mdia>minf>stbl (stsz sizes + stco chunk offset) ->
    n_samples and per-frame byte extents into mdat. Codec entropy decode
    of real video bitstreams (h264 etc.) still needs an external library;
    everything here reads the real box structure."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an MP4")
    brand = b[8:12].decode("ascii", "replace")
    timescale = duration = 0
    width = height = 0
    sizes: list[int] = []
    chunk_off = 0
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
                    elif t3 == b"mdia":
                        for t4, s4, e4 in _walk_boxes(b, s3, e3):
                            if t4 != b"minf":
                                continue
                            for t5, s5, e5 in _walk_boxes(b, s4, e4):
                                if t5 == b"stbl":
                                    sizes, chunk_off = _parse_stbl(b, s5, e5)
    return {
        "format": "mp4",
        "brand": brand,
        "timescale": int(timescale),
        "duration": int(duration),
        "duration_sec": (duration / timescale) if timescale else 0.0,
        "width": int(width),
        "height": int(height),
        "n_samples": len(sizes),
        "sample_sizes": sizes,
        "chunk_offset": int(chunk_off),
    }


def mp4_frames(b: bytes) -> list[bytes]:
    """Per-frame payload extraction via the real sample tables: stsz sizes
    laid out contiguously from the stco chunk offset (single-chunk layout,
    the one the generator writes)."""
    info = parse_mp4(b)
    out = []
    off = info["chunk_offset"]
    for sz in info["sample_sizes"]:
        out.append(b[off : off + sz])
        off += sz
    return out


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


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload


def jpeg_bytes(width: int, height: int, pix: bytes | None = None) -> bytes:
    """With `pix` (row-major 8-bit grayscale, width*height bytes): a
    complete BASELINE grayscale JPEG — SOI, JFIF APP0, DQT (standard
    luminance table), SOF0, DHT (standard DC+AC luminance), SOS and a real
    entropy-coded scan (FDCT + quant + Huffman per the module contract;
    edge blocks replicate border pixels). Without `pix`: the legacy
    header-only marker stream (SOI + APP0 + SOF0 + EOI), kept as the
    no-scan corner case."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    head = b"\xff\xd8" + _seg(0xE0, app0)
    if pix is None:
        return head + _seg(0xC0, sof) + b"\xff\xd9"
    if len(pix) != width * height:
        raise ValueError("pix must be width*height bytes")
    dqt = bytes([0x00]) + bytes(STD_LUMA_QUANT[z] for z in ZIGZAG)
    dht_dc = bytes([0x00]) + bytes(_DC_BITS[1:]) + bytes(_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_BITS[1:]) + bytes(_AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    bwr = _BitWriter()
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = [0] * 64
            for y in range(8):
                yy = min(by * 8 + y, height - 1)  # replicate bottom edge
                for x in range(8):
                    xx = min(bx * 8 + x, width - 1)  # replicate right edge
                    block[y * 8 + x] = pix[yy * width + xx] - 128
            coefs = fdct_quant(block, STD_LUMA_QUANT)
            diff = coefs[0] - pred
            pred = coefs[0]
            size, mag = _mag_bits(diff)
            c, ln = dc_codes[size]
            bwr.put(c, ln)
            if size:
                bwr.put(mag, size)
            run = 0
            last_nz = 0
            zz = [coefs[ZIGZAG[k]] for k in range(64)]
            for k in range(63, 0, -1):
                if zz[k] != 0:
                    last_nz = k
                    break
            for k in range(1, last_nz + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bwr.put(c, ln)
                    run -= 16
                size, mag = _mag_bits(v)
                c, ln = ac_codes[(run << 4) | size]
                bwr.put(c, ln)
                bwr.put(mag, size)
                run = 0
            if last_nz < 63:
                c, ln = ac_codes[0x00]  # EOB
                bwr.put(c, ln)
    return (
        head
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bwr.flush()
        + b"\xff\xd9"
    )


def gif_bytes(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return (
        b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"
    )


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def mp4_bytes(
    width: int,
    height: int,
    n_frames: int,
    timescale: int = 24,
    frames: list[bytes] | None = None,
) -> bytes:
    """A minimal valid ISO BMFF file: ftyp(isom) + moov(mvhd + trak(tkhd
    [+ mdia])) [+ mdat]. Encoded at 1 duration unit per frame
    (timescale=24 <=> 24 fps), so mvhd duration == frame count — the
    parser derives frames from real header fields, no side channel.

    With `frames`, the track carries a REAL sample table: stsd (custom
    'gry8' raw sample entry), stts (1 unit per sample), stsc (single
    chunk), stsz (per-frame byte sizes) and stco (absolute chunk offset
    into the trailing mdat holding the concatenated frame payloads) —
    per-frame extraction reads these tables, no side channel."""
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
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")

    def build(chunk_offset: int) -> bytes:
        trak_kids = _box(b"tkhd", tkhd)
        if frames is not None:
            sample_entry = _box(
                b"gry8",
                b"\x00" * 6 + struct.pack(">H", 1)      # data_ref_index
                + b"\x00" * 16                           # pre_defined/reserved
                + struct.pack(">HH", width, height)
                + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
                + b"\x00" * 4 + struct.pack(">H", 1)     # frame_count
                + b"\x00" * 32                           # compressorname
                + struct.pack(">Hh", 8, -1),             # depth, pre_defined
            )
            stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + sample_entry)
            stts = _box(
                b"stts",
                b"\x00" * 4 + struct.pack(">III", 1, len(frames), 1),
            )
            stsc = _box(
                b"stsc",
                b"\x00" * 4 + struct.pack(">IIII", 1, 1, len(frames), 1),
            )
            stsz = _box(
                b"stsz",
                b"\x00" * 4 + struct.pack(">II", 0, len(frames))
                + b"".join(struct.pack(">I", len(f)) for f in frames),
            )
            stco = _box(
                b"stco", b"\x00" * 4 + struct.pack(">II", 1, chunk_offset)
            )
            stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
            vmhd = _box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
            minf = _box(b"minf", vmhd + stbl)
            mdhd = _box(
                b"mdhd",
                b"\x00" * 4 + struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, n_frames)
                + struct.pack(">HH", 0x55C4, 0),  # language 'und'
            )
            hdlr = _box(
                b"hdlr",
                b"\x00" * 4 + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00",
            )
            trak_kids += _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"moov", _box(b"mvhd", mvhd) + _box(b"trak", trak_kids))

    if frames is None:
        return ftyp + build(0)
    # stco carries the ABSOLUTE offset of the frame payload; the moov size
    # is offset-independent (the field is fixed-width), so build twice
    moov_len = len(build(0))
    offset = len(ftyp) + moov_len + 8  # + mdat box header
    moov = build(offset)
    return ftyp + moov + _box(b"mdat", b"".join(frames))


def wav_bytes(sample_rate: int, samples: list[int]) -> bytes:
    """A complete valid mono PCM16 WAV."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body
