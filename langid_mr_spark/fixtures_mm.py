"""Deterministic multimodal decode fixture (round-5 verdict ask #3).

Builds a small parquet table of REAL container payloads (PNG in every
color type incl. palette, BMP, PPM, GIF static + interlaced, WAV 16/8-bit)
whose EXPECTED decode results — width/height/channels/rate/frames and an
md5 of the raw pixel/PCM bytes — are computed from the ground-truth sample
arrays at ENCODE time, never by calling the decoders. The driver's
`binary_metadata` contract query decodes the payloads through the Spark
`multimodal.decode_image` / `decode_audio` plumbing and the DuckDB oracle
simply selects the expected columns, putting the ~650-LoC pure-Python
decode path under the same hash gate as every relational operator
(pattern: `gate_decisions_oracle`).

Encoder provenance: minimal standalone writers of the public container
formats (RFC 2083 PNG incl. the forward filter transform, BMP
BITMAPINFOHEADER, netpbm P6, GIF87a/89a with a greedy giflib-rule LZW
compressor, RIFF/WAVE PCM). They are the ENCODE-side twins of the
decoders in `multimodal.py` — written against the specs, not against the
decoder code, so a bug on either side shows up as a hash mismatch.

Poison rows are part of the contract: truncated PNG/WAV, a JPEG (codec
stub by design — no codec library in this sandbox) and plain garbage must
land as `decode_ok = false` rows with every metric column NULL.

No wall-clock and no RNG anywhere: payload patterns are closed-form in
(x, y, channel), so the parquet file is byte-stable across runs and the
atomic overwrite below is idempotent.
"""

from __future__ import annotations

import hashlib
import os
import struct
import tempfile
import zlib
from pathlib import Path

# ---------------------------------------------------------------------------
# encoders (spec-side twins of multimodal.py's decoders)
# ---------------------------------------------------------------------------


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png(pixels: bytes, w: int, h: int, nch: int,
               filters: list[int]) -> bytes:
    """RFC 2083 PNG, 8-bit, color type from ``nch``; applies the given
    filter id per scanline (forward transform of §6) so every unfilter
    path in the decoder is exercised by fixture data."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    stride = w * nch
    raw = bytearray()
    prev = bytes(stride)
    for row in range(h):
        cur = pixels[row * stride:(row + 1) * stride]
        f = filters[row % len(filters)]
        raw.append(f)
        for i in range(stride):
            a = cur[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 0:
                v = cur[i]
            elif f == 1:
                v = (cur[i] - a) & 0xFF
            elif f == 2:
                v = (cur[i] - b) & 0xFF
            elif f == 3:
                v = (cur[i] - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (cur[i] - pr) & 0xFF
            raw.append(v)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def encode_png_palette(indices: bytes, w: int, h: int,
                       palette: bytes) -> bytes:
    """Color-type-3 PNG: PLTE + 8-bit index scanlines (filter 0)."""
    raw = b"".join(b"\x00" + indices[r * w:(r + 1) * w] for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", palette)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def encode_bmp(pixels_rgb: bytes, w: int, h: int) -> bytes:
    """Bottom-up 24-bit BITMAPINFOHEADER BMP with 4-byte row alignment."""
    rowsz = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            rgb = pixels_rgb[(r * w + x) * 3:(r * w + x) * 3 + 3]
            row += bytes((rgb[2], rgb[1], rgb[0]))  # BGR on disk
        row += b"\x00" * (rowsz - len(row))
        body += row
    off = 54
    hdr = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    return bytes(hdr + body)


def encode_ppm(pixels_rgb: bytes, w: int, h: int) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + pixels_rgb


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Greedy longest-match GIF-LZW with the giflib code-width growth
    rule (width bumps when the NEXT code to emit would not fit)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    size = min_code + 1
    next_code = eoi + 1
    table = {bytes([i]): i for i in range(1 << min_code)}
    codes = [(clear, size)]

    def bump():
        nonlocal size, next_code
        next_code += 1
        if next_code > (1 << size) and size < 12:
            size += 1

    s = b""
    for c in indices:
        sc = s + bytes([c])
        if sc in table:
            s = sc
            continue
        codes.append((table[s], size))
        table[sc] = next_code
        bump()
        s = bytes([c])
    if s:
        codes.append((table[s], size))
        bump()
    codes.append((eoi, size))
    acc = n = 0
    out = bytearray()
    for code, sz in codes:
        acc |= code << n
        n += sz
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_order(h: int) -> list[int]:
    return ([*range(0, h, 8)] + [*range(4, h, 8)]
            + [*range(2, h, 4)] + [*range(1, h, 2)])


def encode_gif(indices: bytes, w: int, h: int, palette: bytes,
               min_code: int = 2, interlace: bool = False,
               with_extension: bool = False) -> bytes:
    out = bytearray(b"GIF89a" if with_extension else b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (min_code - 1), 0, 0)
    out += palette
    if with_extension:  # graphic control ext — decoder must skip it
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    if interlace:  # rows stored in 4-pass order
        rows = [indices[r * w:(r + 1) * w] for r in range(h)]
        indices = b"".join(bytes(rows[dst]) for dst in _interlace_order(h))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    out += bytes([min_code])
    data = _lzw_encode(bytes(indices), min_code)
    for i in range(0, len(data), 255):
        blk = data[i:i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)


def encode_wav(samples: list[int], channels: int = 1, rate: int = 8000,
               bits: int = 16) -> bytes:
    """RIFF/WAVE PCM; ``samples`` is flat frame-major interleaved int16
    (or 0-255 for bits=8)."""
    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes(samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * bits // 8,
                      channels * bits // 8, bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


# ---------------------------------------------------------------------------
# fixture rows: payload + EXPECTED decode results from ground truth
# ---------------------------------------------------------------------------


def _pat(w: int, h: int, nch: int) -> bytes:
    """Closed-form per-(x, y, c) pixel pattern — no RNG, byte-stable."""
    return bytes(((x * 7 + y * 13 + c * 29) & 0xFF)
                 for y in range(h) for x in range(w) for c in range(nch))


def _md5(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


_GIF_PALETTE = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 40, 50, 60))


def _gif_indices(w: int, h: int) -> bytes:
    # varied pattern → LZW dictionary growth through several code widths
    return bytes(((x * 3 + y * 5 + (x * y) // 3) % 4)
                 for y in range(h) for x in range(w))


def _pcm16_bytes(samples: list[int]) -> bytes:
    """Expected int16 PCM after the decoder's float round-trip. The
    decoder maps s/32768 → clip[-1, 1-1/32768] → ·32768 → int16, which is
    the identity on every int16 value (exact in float64), so the expected
    bytes are just the source samples re-serialized."""
    return b"".join(struct.pack("<h", s) for s in samples)


def _pcm8_as16_bytes(samples: list[int]) -> bytes:
    """8-bit PCM expectation: decoder maps b → (b-128)/128 float, then
    int16 encode gives exactly (b-128)·256 (exact in float64, in-range
    for every b in 0..255)."""
    return b"".join(struct.pack("<h", (b - 128) * 256) for b in samples)


def decode_fixture_rows() -> list[dict]:
    """The fixture table: one dict per row with payload + expected
    columns. ``exp_ok=False`` rows expect NULL in every metric column
    (the D5 poison-row contract: decode failures are rows, never dead
    tasks)."""
    rows: list[dict] = []

    def img(i, kind, payload, w, h, nch, truth):
        rows.append(dict(id=i, kind=kind, payload=payload, exp_width=w,
                         exp_height=h, exp_channels=nch, exp_rate=None,
                         exp_n_frames=None, exp_md5=_md5(truth),
                         exp_ok=True))

    def aud(i, payload, rate, nch, n_frames, truth):
        rows.append(dict(id=i, kind="wav", payload=payload, exp_width=None,
                         exp_height=None, exp_channels=nch, exp_rate=rate,
                         exp_n_frames=n_frames, exp_md5=_md5(truth),
                         exp_ok=True))

    def bad(i, kind, payload):
        rows.append(dict(id=i, kind=kind, payload=payload, exp_width=None,
                         exp_height=None, exp_channels=None, exp_rate=None,
                         exp_n_frames=None, exp_md5=None, exp_ok=False))

    # PNG: RGB through all five filter types, grayscale, RGBA, palette
    px = _pat(9, 7, 3)
    img(1, "png", encode_png(px, 9, 7, 3, [0, 1, 2, 3, 4]), 9, 7, 3, px)
    g = _pat(6, 5, 1)
    img(2, "png", encode_png(g, 6, 5, 1, [2]), 6, 5, 1, g)
    ga = _pat(4, 6, 4)
    img(3, "png", encode_png(ga, 4, 6, 4, [4]), 4, 6, 4, ga)
    idx = _gif_indices(8, 5)
    pal_truth = b"".join(_GIF_PALETTE[3 * i:3 * i + 3] for i in idx)
    img(4, "png", encode_png_palette(idx, 8, 5, _GIF_PALETTE), 8, 5, 3,
        pal_truth)

    # BMP (bottom-up + row padding) and PPM
    bpx = _pat(5, 4, 3)
    img(5, "bmp", encode_bmp(bpx, 5, 4), 5, 4, 3, bpx)
    ppx = _pat(7, 3, 3)
    img(6, "ppm", encode_ppm(ppx, 7, 3), 7, 3, 3, ppx)

    # GIF static + interlaced-with-extension
    gidx = _gif_indices(20, 17)
    gtruth = b"".join(_GIF_PALETTE[3 * i:3 * i + 3] for i in gidx)
    img(7, "gif", encode_gif(gidx, 20, 17, _GIF_PALETTE), 20, 17, 3, gtruth)
    iidx = _gif_indices(8, 13)
    itruth = b"".join(_GIF_PALETTE[3 * i:3 * i + 3] for i in iidx)
    img(8, "gif", encode_gif(iidx, 8, 13, _GIF_PALETTE, interlace=True,
                             with_extension=True), 8, 13, 3, itruth)

    # WAV: 16-bit mono (extremes incl. ±32768 clip boundary), 8-bit stereo
    s16 = [0, 16384, -16384, 32767, -32768, 1, -1, 12345]
    aud(9, encode_wav(s16, 1, 8000, 16), 8000, 1, 8, _pcm16_bytes(s16))
    s8 = [128, 255, 0, 128, 64, 192]  # 3 frames × 2 channels interleaved
    aud(10, encode_wav(s8, 2, 4000, 8), 4000, 2, 3, _pcm8_as16_bytes(s8))

    # poison rows: truncated PNG, truncated WAV (round-5 guard), JPEG
    # (codec stub by design), garbage
    # cut deep into the IDAT (clipping only IEND decodes fine — the
    # decoder reads chunks, not the trailer): half the stream guarantees
    # an incomplete zlib body
    whole = encode_png(px, 9, 7, 3, [0])
    bad(11, "png", whole[:len(whole) // 2])
    bad(12, "wav", encode_wav(s16, 1, 8000, 16)[:-6])
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    bad(13, "jpeg", b"\xff\xd8" + app0 + b"\xff\xd9")
    bad(14, "unknown", b"not a media container at all")
    return rows


def ensure_decode_fixture(path: str | Path) -> Path:
    """Idempotent atomic write of the fixture parquet (single file, fixed
    schema). Content is deterministic, so a concurrent writer produces
    identical bytes and ``os.replace`` keeps readers consistent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = Path(path)
    rows = decode_fixture_rows()
    schema = pa.schema([
        ("id", pa.int64()), ("kind", pa.string()), ("payload", pa.binary()),
        ("exp_width", pa.int32()), ("exp_height", pa.int32()),
        ("exp_channels", pa.int32()), ("exp_rate", pa.int32()),
        ("exp_n_frames", pa.int32()), ("exp_md5", pa.string()),
        ("exp_ok", pa.bool_()),
    ])
    table = pa.Table.from_pylist(rows, schema=schema)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".parquet.tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, compression="snappy")
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path
