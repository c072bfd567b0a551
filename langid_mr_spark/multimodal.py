"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The reference's payload IS multimodal (audio blobs decoded by audio_io.py:
53-195 with codec sniffing and resampling). This module re-creates that
shape for a Spark table: the Spark-side plumbing — schema, Arrow batch
handling, partitioning-safe UDF signatures — is real and tested; the codec
decode itself is stubbed (the container ships no image/audio libraries)
behind ``decode_stub``/a deterministic fake feature extractor, exactly as
the task brief directs.

Surface:
- ``sniff_metadata_col``  — native magic-byte sniffing → struct<format,size>
  (audio_io's probe-order fallback analog, audio_io.py:66-101)
- ``decode_headers``      — REAL container-metadata decode (PNG IHDR, JPEG
  SOF, GIF screen, WAV fmt) by pure byte parsing — no codec library needed;
  the ffprobe-step analog (audio_io.py:53-101) and everything a curation
  filter reads (dimensions, channels, sample rate, bit depth)
- ``extract_features``    — mapInPandas: binary → fixed-dim float vector
  (deterministic fake: hashed byte histogram; swap for a real model UDF)
- ``decode_image``        — REAL pixel decode for PNG (stdlib zlib: 8-bit
  non-interlaced, all five filters, palette expansion), BMP (uncompressed
  24/32-bit, bottom-up/top-down), PPM P6, and GIF (pure-Python LZW with
  variable code width, interlace de-weaving, local/global color tables) —
  no imaging library. JPEG is the one codec-bound format left honestly
  stubbed: its rows carry the NotImplementedError message in
  ``decode_error`` (poison-safe rows, never dead tasks).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-byte prefixes → format label (checked in order, like the
# reference's decoder fallback chain audio_io.py:66-101)
MAGIC = (
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),   # wav/avi container
    ("494433", "mp3"),
    ("3c68746d6c", "html"),
    ("3c21646f63", "html"),
)

FEATURE_DIM = 16


def sniff_format(col: Column) -> Column:
    """Native magic-byte dispatch over hex(prefix) — no UDF."""
    prefix = F.lower(F.hex(F.substring(col, 1, 8)))
    out = F.lit("unknown")
    for magic, label in reversed(MAGIC):
        out = F.when(prefix.startswith(magic), F.lit(label)).otherwise(out)
    return F.when(col.isNull(), F.lit(None)).otherwise(out)


def sniff_metadata_col(col: Column) -> Column:
    """struct<format string, size_bytes long> typed metadata."""
    return F.struct(
        sniff_format(col).alias("format"),
        F.length(col).cast("long").alias("size_bytes"),
    )


def with_metadata(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    return df.withColumn("meta", sniff_metadata_col(F.col(binary_col)))


def fake_features(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature vector: normalized histogram of bytes
    folded into ``dim`` buckets. Stands in for a real encoder; keeps the
    batch shape, schema, and determinism contracts testable."""
    if not payload:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    total = hist.sum()
    return (hist / total).tolist()


def extract_features(df: DataFrame, binary_col: str = "payload",
                     dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas over Arrow batches: binary → array<double> features.

    Keeps every input column and appends ``features``; the per-batch loop is
    vectorized per element only at the numpy level (the real-model version
    would hand the whole batch to the encoder)."""
    from pyspark.sql import types as T

    # copy, don't .add(): StructType.add mutates the df's cached schema
    schema_out = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = pdf[binary_col].map(
                lambda b: fake_features(b, dim))
            yield pdf

    return df.mapInPandas(run, schema=schema_out)


# --- real container-header decode (pure byte parsing, no codec libs) --------

def decode_header(payload: bytes | None) -> dict:
    """Parse REAL container metadata from the payload's header bytes —
    PNG IHDR, JPEG SOF, GIF logical screen, WAV fmt chunk — the analog of
    the reference's ffprobe step (audio_io.py:53-101) that needs no codec
    library. Pixel/sample decode stays stubbed (decode_image); everything a
    curation pipeline filters on (dimensions, channels, sample rate, bit
    depth) is decoded for real here. Returns a dict matching HEADER_FIELDS;
    unparseable payloads set error instead of raising (poison-safe)."""
    import struct as S

    out = {"kind": None, "width": None, "height": None, "channels": None,
           "sample_rate": None, "bit_depth": None, "error": None}
    if not payload:
        out["error"] = "empty payload"
        return out
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            # IHDR is mandated to be the first chunk: len(4) 'IHDR' data
            if payload[12:16] != b"IHDR" or len(payload) < 26:
                raise ValueError("PNG without leading IHDR")
            w, h = S.unpack(">II", payload[16:24])
            depth, color = payload[24], payload[25]
            out.update(kind="png", width=w, height=h, bit_depth=depth,
                       channels={0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color))
        elif payload[:3] == b"\xff\xd8\xff":
            i, n = 2, len(payload)
            while i + 4 <= n:
                if payload[i] != 0xFF:
                    raise ValueError("JPEG marker desync")
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = S.unpack(">H", payload[i + 2:i + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                    depth = payload[i + 4]
                    h, w = S.unpack(">HH", payload[i + 5:i + 9])
                    out.update(kind="jpeg", width=w, height=h,
                               bit_depth=depth, channels=payload[i + 9])
                    break
                i += 2 + seglen
            else:
                raise ValueError("JPEG without SOF marker")
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = S.unpack("<HH", payload[6:10])
            out.update(kind="gif", width=w, height=h, bit_depth=8)
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            i, n = 12, len(payload)
            while i + 8 <= n:
                cid = payload[i:i + 4]
                clen = S.unpack("<I", payload[i + 4:i + 8])[0]
                if cid == b"fmt ":
                    ch, rate = S.unpack("<HI", payload[i + 10:i + 16])
                    bits = S.unpack("<H", payload[i + 22:i + 24])[0]
                    out.update(kind="wav", channels=ch, sample_rate=rate,
                               bit_depth=bits)
                    break
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            else:
                raise ValueError("WAV without fmt chunk")
        else:
            out["error"] = "unknown container"
    except Exception as e:
        out.update(kind=None, width=None, height=None, channels=None,
                   sample_rate=None, bit_depth=None,
                   error=f"{type(e).__name__}: {e}"[:200])
    return out


HEADER_FIELDS = ("kind", "width", "height", "channels",
                 "sample_rate", "bit_depth", "error")


def decode_headers(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """mapInPandas: binary → real decoded container metadata columns.
    Poison payloads land in the ``header_error`` column, never a task
    failure (same D5 contract as the text pipeline)."""
    from pyspark.sql import types as T

    schema_out = T.StructType(
        list(df.schema.fields)
        + [T.StructField("kind", T.StringType()),
           T.StructField("width", T.IntegerType()),
           T.StructField("height", T.IntegerType()),
           T.StructField("channels", T.IntegerType()),
           T.StructField("sample_rate", T.IntegerType()),
           T.StructField("bit_depth", T.IntegerType()),
           T.StructField("header_error", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            metas = [decode_header(b) for b in pdf[binary_col]]
            for field in HEADER_FIELDS:
                col = "header_error" if field == "error" else field
                pdf[col] = [m[field] for m in metas]
            yield pdf

    return df.mapInPandas(run, schema=schema_out)


# --- real pixel decode (pure Python: PNG via stdlib zlib, BMP, PPM) ----------

def _png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """PNG → (width, height, channels, raw pixel bytes). Real decode via
    stdlib zlib: 8-bit depth, non-interlaced, all five scanline filters
    (None/Sub/Up/Average/Paeth, RFC 2083 §6), palette expansion for color
    type 3. Pure-Python unfiltering — correct and test-sized; a production
    deployment swaps a vectorized codec behind the same signature."""
    import struct as S
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, plte = 8, b"", None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(payload):
        ln = S.unpack(">I", payload[pos:pos + 4])[0]
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = S.unpack(
                ">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG without IHDR")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
    if interlace:
        raise NotImplementedError("interlaced PNG")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = zlib.decompress(idat)
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _row in range(h):
        f = raw[pos]
        cur = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if f == 1:    # Sub
            for i in range(nch, stride):
                cur[i] = (cur[i] + cur[i - nch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out += cur
        prev = cur
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        px = bytearray()
        for b in out:
            if 3 * b + 3 > len(plte):
                # a silent short slice would yield a wrong-length pixel
                # buffer with decode_error NULL — fail the row instead
                raise ValueError("palette index out of range")
            px += plte[3 * b:3 * b + 3]
        out, nch = px, 3
    return w, h, nch, bytes(out)


def _bmp_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """BMP → (width, height, channels, RGB(A) bytes). Uncompressed
    24/32-bit BITMAPINFOHEADER, bottom-up (positive height) or top-down;
    rows are 4-byte aligned; BGR(A) storage converted to RGB(A)."""
    import struct as S

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = S.unpack("<I", payload[10:14])[0]
    w, h = S.unpack("<ii", payload[18:26])
    bpp = S.unpack("<H", payload[28:30])[0]
    comp = S.unpack("<I", payload[30:34])[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} comp={comp} "
                                  "(only uncompressed 24/32-bit)")
    nch = bpp // 8
    bottom_up, h = h > 0, abs(h)
    rowsz = ((w * nch + 3) // 4) * 4
    out = bytearray()
    rows = range(h - 1, -1, -1) if bottom_up else range(h)
    for r in rows:
        row = payload[off + r * rowsz: off + r * rowsz + w * nch]
        if len(row) < w * nch:
            raise ValueError("truncated BMP")
        for x in range(w):
            px = row[x * nch:(x + 1) * nch]
            out += bytes((px[2], px[1], px[0]))
            if nch == 4:
                out.append(px[3])
    return w, h, nch, bytes(out)


def _ppm_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """PPM (P6, maxval 255) → (width, height, 3, RGB bytes)."""
    import re

    m = re.match(
        rb"P6[ \t\r\n]+(?:#[^\n]*\n[ \t\r\n]*)?(\d+)[ \t\r\n]+(\d+)"
        rb"[ \t\r\n]+(\d+)[ \t\r\n]", payload)
    if not m:
        raise ValueError("bad PPM header")
    w, h, maxval = int(m[1]), int(m[2]), int(m[3])
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255")
    data = payload[m.end():m.end() + w * h * 3]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM")
    return w, h, 3, bytes(data)


def _gif_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """GIF → (width, height, 3, RGB bytes) of the FIRST image frame — real
    pure-Python LZW decompression: variable code width with the giflib
    growth rule (width bumps when the per-code counter exceeds 2^width,
    counted per code read since the last CLEAR — NOT per table append,
    which lags one behind), CLEAR/EOI handling, KwKwK case, 12-bit cap;
    then interlace de-weaving (the 8/8/4/2 four-pass row order) and
    local-over-global color table mapping. GIF89a extensions (graphic
    control, comments) are skipped; transparency is ignored (opaque RGB)."""
    import struct as S

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    _sw, _sh, packed = S.unpack("<HHB", payload[6:11])
    pos, gct = 13, None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: introducer + label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            break
        elif b == 0x3B:
            raise ValueError("GIF without image data")
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    else:
        raise ValueError("truncated GIF")
    _l, _t, w, h, ipacked = S.unpack("<HHHHB", payload[pos + 1:pos + 10])
    pos += 10
    ct = gct
    if ipacked & 0x80:  # local color table overrides global
        n = 2 << (ipacked & 0x07)
        ct = payload[pos:pos + 3 * n]
        pos += 3 * n
    if ct is None:
        raise ValueError("GIF without color table")
    min_code = payload[pos]
    pos += 1
    data = bytearray()
    while pos < len(payload) and payload[pos]:
        ln = payload[pos]
        data += payload[pos + 1:pos + 1 + ln]
        pos += 1 + ln

    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = [bytes((i,)) for i in range(1 << min_code)] + [b"", b""]
    table = list(base)
    size, next_code = min_code + 1, eoi + 1
    acc = nbits = 0
    prev: bytes | None = None
    out = bytearray()
    done = False
    for byte in data:
        if done:
            break
        acc |= byte << nbits
        nbits += 8
        while nbits >= size:
            code = acc & ((1 << size) - 1)
            acc >>= size
            nbits -= size
            if code == clear:
                table = list(base)
                size, next_code = min_code + 1, eoi + 1
                prev = None
                continue
            if code == eoi:
                done = True
                break
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            else:
                raise ValueError("bad LZW code")
            out += entry
            prev = entry
            next_code += 1
            if next_code > (1 << size) and size < 12:
                size += 1

    if len(out) < w * h:
        raise ValueError("truncated GIF image data")
    idx = out[:w * h]
    if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
        rows = [idx[r * w:(r + 1) * w] for r in range(h)]
        order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                 + [*range(2, h, 4)] + [*range(1, h, 2)])
        de: list[bytes | None] = [None] * h
        for src, dst in enumerate(order):
            de[dst] = rows[src]
        idx = bytearray(b"".join(r for r in de if r is not None))
    px = bytearray()
    for i in idx:
        if 3 * i + 3 > len(ct):
            raise ValueError("color index out of range")
        px += ct[3 * i:3 * i + 3]
    return w, h, 3, bytes(px)


def decode_pixels(payload: bytes | None) -> tuple[int, int, int, bytes]:
    """Dispatch → (width, height, channels, raw pixel bytes). Raises
    NotImplementedError only for JPEG — the one genuinely codec-bound
    format left (entropy decode); PNG/BMP/PPM/GIF decode for real."""
    if not payload:
        raise ValueError("empty payload")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_pixels(payload)
    if payload[:2] == b"BM":
        return _bmp_pixels(payload)
    if payload[:2] == b"P6":
        return _ppm_pixels(payload)
    if payload[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "JPEG pixel decode requires an entropy codec library "
            "(header metadata IS decoded — decode_headers)")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_pixels(payload)
    raise ValueError("unknown image container")


def decode_image(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """mapInPandas: binary → decoded pixels (raw bytes) + dimensions.
    PNG/BMP/PPM/GIF decode for REAL (pure Python, golden-byte-tested);
    JPEG rows carry the NotImplementedError message in ``decode_error`` —
    poison-safe rows, never dead tasks (D5)."""
    from pyspark.sql import types as T

    schema_out = T.StructType(
        list(df.schema.fields)
        + [T.StructField("width", T.IntegerType()),
           T.StructField("height", T.IntegerType()),
           T.StructField("channels", T.IntegerType()),
           T.StructField("pixels", T.BinaryType()),
           T.StructField("decode_error", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            ws, hs, cs, ps, es = [], [], [], [], []
            for b in pdf[binary_col]:
                try:
                    w, h, c, px = decode_pixels(b)
                    ws.append(w); hs.append(h); cs.append(c)
                    ps.append(px); es.append(None)
                except Exception as e:
                    ws.append(None); hs.append(None); cs.append(None)
                    ps.append(None)
                    es.append(f"{type(e).__name__}: {e}"[:200])
            pdf["width"] = pd.array(ws, dtype="Int32")
            pdf["height"] = pd.array(hs, dtype="Int32")
            pdf["channels"] = pd.array(cs, dtype="Int32")
            pdf["pixels"] = pd.Series(ps, dtype=object, index=pdf.index)
            pdf["decode_error"] = pd.Series(es, dtype=object, index=pdf.index)
            yield pdf

    return df.mapInPandas(run, schema=schema_out)
