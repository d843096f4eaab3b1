"""Multimodal column support: opaque binary payloads + typed metadata.

Pattern: an asset table with a `binary` content column and typed
metadata columns; decode / feature-extraction runs as Arrow-batched
mapInPandas stages. Four REAL pure-Python decode kernels are wired —
uncompressed BMP (24/32-bit), PCM WAV (8/16-bit), COMPRESSED PNG
(zlib inflate + per-row unfilter; 8/16-bit gray/RGB/palette/alpha),
and JPEG — baseline sequential AND progressive (ITU-T T.81
SOF0/SOF1/SOF2: stream-defined Huffman + quantization tables,
restart intervals, any subsampling, spectral selection + successive
approximation scan scripts with EOB-run coding, 2-D IDCT,
YCbCr->RGB) — parsed with struct/zlib/numpy, no codec libraries.
Payloads in other containers (arithmetic-coded JPEG, WebP, MP3,
video) fall back to a deterministic byte-histogram pseudo-feature
and are marked ``decode_ok=false``; plug PIL/ffmpeg into
``_decode_image`` for those."""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .util import spread as _spread

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("content", T.BinaryType(), True),     # opaque payload
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def synthesize_assets(documents: DataFrame) -> DataFrame:
    """Build a deterministic asset table from the documents fixture:
    the utf-8 text bytes act as the opaque payload."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def _bmp_pixels(payload: bytes):
    """Parse an uncompressed 24/32-bit BMP to a top-down (rows, w, 3)
    BGR uint8 array. Raises ValueError on anything else — shared by
    decode_bmp (feature vector) and image_dhash (perceptual hash)."""
    import numpy as np
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    dib = struct.unpack_from("<I", payload, 14)[0]
    if dib < 40:
        raise ValueError("unsupported DIB header")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        raise ValueError("only uncompressed 24/32-bit BMP supported")
    nrows = abs(h)
    stride = (w * (bpp // 8) + 3) // 4 * 4
    need = pix_off + stride * nrows
    if len(payload) < need:
        raise ValueError("truncated pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * nrows,
                         offset=pix_off).reshape(nrows, stride)
    px = rows[:, :w * (bpp // 8)].reshape(nrows, w, bpp // 8)[:, :, :3]
    # positive height = bottom-up pixel order; normalize to top-down
    return px[::-1] if h > 0 else px


def decode_bmp(payload: bytes) -> list[float]:
    """REAL image decode: uncompressed 24/32-bit BMP parsed with
    struct + numpy (no codec library). 8-dim feature:
    [width, height, bits-per-pixel, mean_R, mean_G, mean_B (0..1),
    brightness (0..1), n_pixels]. Raises ValueError on anything that
    isn't an uncompressed BMP."""
    if len(payload) >= 30:
        bpp = struct.unpack_from("<H", payload, 28)[0]
    else:
        bpp = 0
    px = _bmp_pixels(payload)
    nrows, w = px.shape[0], px.shape[1]
    means = px.astype("float64").mean(axis=(0, 1)) / 255.0
    return [float(w), float(nrows), float(bpp),
            round(float(means[2]), 6), round(float(means[1]), 6),
            round(float(means[0]), 6),
            round(float(means.mean()), 6), float(w * nrows)]


def _tiff_lzw(data: bytes) -> bytes:
    """TIFF 6.0 LZW decompression (r13): MSB-first bit packing,
    Clear=256 / EOI=257, EARLY code-width change (9→10→11→12 when
    the next free code reaches 2^width − 1 — TIFF's one divergence
    from GIF's LZW), KwKwK handled. Raises ValueError on a
    malformed or truncated stream."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: dict = {}
    width, next_code = 9, 258
    prev = None
    acc = nacc = pos = 0
    started = False
    while True:
        while nacc < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW (no EOI)")
            acc = (acc << 8) | data[pos]
            pos += 1
            nacc += 8
        code = (acc >> (nacc - width)) & ((1 << width) - 1)
        nacc -= width
        acc &= (1 << nacc) - 1
        if code == CLEAR:
            table = {i: bytes([i]) for i in range(256)}
            width, next_code, prev = 9, 258, None
            started = True
            continue
        if code == EOI:
            return bytes(out)
        if not started:
            raise ValueError("TIFF LZW stream must begin with Clear")
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("bad first TIFF LZW code")
        else:
            entry = table.get(code)
            if entry is None:
                if code != next_code:
                    raise ValueError("TIFF LZW code outside table")
                entry = prev + prev[:1]       # KwKwK
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1                     # early change
        out += entry
        prev = entry


def _tiff_lzw_encode(seg: bytes) -> bytes:
    """Literal-code TIFF LZW (the decoder's round-trip twin): emits
    only single-byte codes but tracks the DECODER's dictionary
    growth exactly — early width change, Clear before the table
    fills — the same simplest-valid-stream posture as the GIF
    builder."""
    CLEAR, EOI = 256, 257
    codes = [(CLEAR, 9)]
    width, next_code, first = 9, 258, True
    for b in seg:
        codes.append((b, width))
        if first:
            first = False
        else:
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            if next_code >= 4093:
                codes.append((CLEAR, width))
                width, next_code, first = 9, 258, True
    codes.append((EOI, width))
    out = bytearray()
    acc = nacc = 0
    for code, w in codes:
        acc = (acc << w) | code
        nacc += w
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
            acc &= (1 << nacc) - 1
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _tiff_pixels(payload: bytes):
    """Parse a baseline TIFF 6.0 to a top-down (h, w, 3) RGB uint8
    array (r13): both byte orders (II/MM), first IFD, 8-bit
    grayscale (photometric 0/1, WhiteIsZero inverted) and RGB
    (photometric 2, chunky planar config), strip layout honored
    (RowsPerStrip + StripOffsets/ByteCounts arrays), Compression 1
    (none), 32773 (PackBits RLE) and 5 (LZW, MSB-first with early
    change) with the horizontal-differencing predictor (tag 317=2),
    and (r14) uniform 16-bit samples in either byte order —
    downconverted by the high byte (v >> 8, the exact inverse of
    the v*257 upconvert), differencing undone per 16-bit sample —
    plus (r14) the TILED layout (tags 322-325: tw×th grid, edge
    tiles padded, each tile decompressed/un-differenced over its
    own row width and pasted unpadded). Payload-controlled geometry
    is bounded at 16M pixels (canvas AND tile — the GIF kernel's
    allocation-bomb rule). Everything else — JPEG-in-TIFF,
    planar=2, mixed or other depths — raises ValueError and falls
    to the documented plug-in slot. Covers what scanners and
    archival pipelines actually emit."""
    import numpy as np
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF")
    e = "<" if payload[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(e + "HI", payload, 2)
    if magic != 42:
        raise ValueError("not a TIFF")
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF")
    n_entries = struct.unpack_from(e + "H", payload, ifd_off)[0]
    if ifd_off + 2 + 12 * n_entries > len(payload):
        raise ValueError("truncated TIFF IFD")
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    tags = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, off)
        if typ not in type_size or cnt == 0:
            # RATIONAL etc. unused; a zero-count tag is treated as
            # absent — indexing its empty value list was an
            # IndexError escaping the ValueError fallback guards
            # (review r13)
            continue
        total = type_size[typ] * cnt
        src = off + 8 if total <= 4 else struct.unpack_from(
            e + "I", payload, off + 8)[0]
        if src + total > len(payload):
            raise ValueError("truncated TIFF tag data")
        tags[tag] = list(struct.unpack_from(
            e + str(cnt) + type_fmt[typ], payload, src))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if not (0 < w and 0 < h):
        raise ValueError("empty TIFF image")
    if w * h > 16_000_000:
        # payload-controlled geometry must never drive allocation
        # (the GIF kernel's 16M-pixel bound, review r13) — the tiled
        # path allocates a canvas up front, and LZW strips can
        # expand far beyond the payload size
        raise ValueError("TIFF canvas beyond the 16M-pixel bound")
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    bps = bits[0]
    if any(b != bps for b in bits) or bps not in (8, 16):
        raise ValueError("TIFF bit depth beyond the kernel "
                         "(uniform 8- or 16-bit only)")
    sw = bps // 8                          # sample width in bytes
    if one(284, 1) != 1:
        raise ValueError("planar TIFF beyond the baseline kernel")
    if comp not in (1, 5, 32773):
        raise ValueError("compressed TIFF beyond the baseline "
                         "kernel (plug a codec into _decode_image)")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError("TIFF predictor beyond the baseline kernel")
    if (photo in (0, 1) and spp != 1) or (photo == 2 and spp != 3) \
            or photo not in (0, 1, 2):
        raise ValueError("TIFF photometric/samples combination "
                         "beyond the baseline kernel")
    def segment(so, sc, seg_w):
        """One strip/tile: bounds-check, decompress (PackBits/LZW),
        undo differencing over rows of ``seg_w`` pixels — the only
        layout difference between a strip (seg_w = w) and a tile
        (seg_w = tile width)."""
        if so + sc > len(payload):
            raise ValueError("truncated TIFF strip")
        seg = payload[so:so + sc]
        if comp == 32773:                  # PackBits
            out, p = bytearray(), 0
            while p < len(seg):
                nv = seg[p]
                nn = nv - 256 if nv >= 128 else nv
                p += 1
                if nn == -128:
                    continue
                if nn >= 0:
                    if p + nn + 1 > len(seg):
                        raise ValueError("truncated TIFF PackBits")
                    out += seg[p:p + nn + 1]
                    p += nn + 1
                else:
                    if p >= len(seg):
                        raise ValueError("truncated TIFF PackBits")
                    out += bytes([seg[p]]) * (1 - nn)
                    p += 1
            seg = bytes(out)
        elif comp == 5:
            seg = _tiff_lzw(seg)
        if predictor == 2:
            # horizontal differencing: each sample stores the delta
            # to its left neighbor — undo with a row-wise cumsum per
            # channel (strips and tiles are row-aligned, so
            # per-segment is exact); 16-bit deltas are per SAMPLE in
            # the file's byte order, mod 65536
            row_bytes = seg_w * spp * sw
            if len(seg) % row_bytes:
                raise ValueError("TIFF strip not row-aligned")
            if sw == 1:
                arr = (np.frombuffer(seg, dtype=np.uint8)
                       .reshape(-1, seg_w, spp).astype(np.uint32))
                arr = np.cumsum(arr, axis=1, dtype=np.uint32) % 256
                seg = arr.astype(np.uint8).tobytes()
            else:
                arr = (np.frombuffer(seg, dtype=np.dtype(e + "u2"))
                       .reshape(-1, seg_w, spp).astype(np.uint64))
                arr = np.cumsum(arr, axis=1, dtype=np.uint64) % 65536
                seg = arr.astype(np.dtype(e + "u2")).tobytes()
        return seg

    def to_samples(raw: bytes, n_samples: int):
        if len(raw) < n_samples * sw:
            raise ValueError("TIFF pixel data shorter than w*h")
        if sw == 1:
            return np.frombuffer(raw[:n_samples], dtype=np.uint8)
        # high-byte downconvert: (65535-v)>>8 == 255-(v>>8) exactly,
        # so WhiteIsZero inversion below stays correct post-convert
        return (np.frombuffer(raw[:n_samples * 2],
                              dtype=np.dtype(e + "u2"))
                >> 8).astype(np.uint8)

    tiled = 322 in tags or 324 in tags
    if tiled and 273 in tags:
        raise ValueError("TIFF with both strip and tile layout")
    if tiled:
        # tiled layout (r14): the image is a grid of tw×th tiles,
        # left-to-right top-to-bottom, edge tiles PADDED to full
        # size — decode each tile and paste its unpadded region
        tw, th = one(322), one(323)
        toffs = tags.get(324)
        tcounts = tags.get(325)
        if not (0 < tw and 0 < th) or tw * th > 16_000_000:
            raise ValueError("TIFF tile geometry beyond the "
                             "16M-pixel bound")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if not toffs or not tcounts or len(toffs) != len(tcounts) \
                or len(toffs) != across * down:
            raise ValueError("TIFF tile layout inconsistent with "
                             "the tile grid")
        canvas = np.zeros((h, w, spp), dtype=np.uint8)
        for ti, (so, sc) in enumerate(zip(toffs, tcounts)):
            raw = segment(so, sc, tw)
            tile = to_samples(raw, tw * th * spp) \
                .reshape(th, tw, spp)
            y0 = (ti // across) * th
            x0 = (ti % across) * tw
            ch = min(th, h - y0)
            cw = min(tw, w - x0)
            canvas[y0:y0 + ch, x0:x0 + cw] = tile[:ch, :cw]
        arr = canvas.reshape(-1)
    else:
        offs = tags.get(273)
        counts = tags.get(279)
        if not offs or not counts or len(offs) != len(counts):
            raise ValueError("TIFF missing strip layout")
        one(278, h)      # RowsPerStrip: validation-only — strips
        #                  concatenate back to the row-major stream
        data = bytearray()
        for so, sc in zip(offs, counts):
            data += segment(so, sc, w)
        arr = to_samples(bytes(data), w * h * spp)
    if photo == 2:
        px = arr.reshape(h, w, 3)
    else:
        g = arr.reshape(h, w)
        if photo == 0:                     # WhiteIsZero
            g = 255 - g
        px = np.repeat(g[:, :, None], 3, axis=2)
    return px


def decode_tiff(payload: bytes) -> list[float]:
    """REAL baseline-TIFF decode (r13): same 8-dim contract as
    decode_bmp/decode_png/decode_jpeg/decode_gif — [width, height,
    channels, mean_R, mean_G, mean_B (0..1), brightness (0..1),
    n_pixels]."""
    px = _tiff_pixels(payload)
    h, w = px.shape[0], px.shape[1]
    means = px.astype("float64").mean(axis=(0, 1)) / 255.0
    return [float(w), float(h), 3.0,
            round(float(means[0]), 6), round(float(means[1]), 6),
            round(float(means[2]), 6),
            round(float(means.mean()), 6), float(w * h)]


def encode_tiff(px_rows, endian: str = "<", gray: bool = False,
                packbits: bool = False, lzw: bool = False,
                predictor: bool = False,
                rows_per_strip: int | None = None,
                depth: int = 8,
                tiles: tuple | None = None) -> bytes:
    """Baseline TIFF 6.0 encoder (r13 — decode_tiff's round-trip
    oracle, same fixture-encoder role as encode_jpeg_baseline /
    encode_gif): RGB (chunky) or grayscale, either byte order,
    multi-strip layout, optional PackBits or LZW compression and
    the horizontal-differencing predictor. ``px_rows`` is rows of
    (r, g, b) tuples, or ints when ``gray``. ``depth=16`` (r14)
    emits 16-bit samples as v*257 (v<<8 | v — the exact upconvert,
    so the decoder's high-byte downconvert round-trips
    bit-identically), with per-16-bit-sample differencing when
    ``predictor``. ``tiles=(tw, th)`` (r14) emits the TILED layout
    instead of strips: zero-padded edge tiles, tags 322-325,
    compression/predictor applied per tile over its own row
    width."""
    if endian not in ("<", ">"):
        raise ValueError("encode_tiff: endian must be '<' or '>'")
    if packbits and lzw:
        raise ValueError("encode_tiff: pick one of packbits/lzw")
    if depth not in (8, 16):
        raise ValueError("encode_tiff: depth must be 8 or 16")
    if tiles is not None and rows_per_strip is not None:
        raise ValueError("encode_tiff: pick one of tiles/"
                         "rows_per_strip")
    h, w = len(px_rows), len(px_rows[0])
    spp = 1 if gray else 3
    rps = rows_per_strip or h
    sample_rows = [list(row) if gray
                   else [c for px in row for c in px]
                   for row in px_rows]

    def pack_samples(vals) -> bytes:
        if depth == 8:
            return bytes(vals)
        return struct.pack(endian + str(len(vals)) + "H",
                           *[v * 257 for v in vals])

    raw_rows = [pack_samples(vals) for vals in sample_rows]

    def pack(seg: bytes) -> bytes:
        # literal-only PackBits (runs of <=128 literals) — simplest
        # valid stream, mirroring the literal-code LZW posture
        out = bytearray()
        for i in range(0, len(seg), 128):
            chunk = seg[i:i + 128]
            out += bytes([len(chunk) - 1]) + chunk
        return bytes(out)

    def diff(seg: bytes, seg_w: int = None) -> bytes:
        # horizontal differencing per row per channel (predictor 2);
        # 16-bit deltas are per SAMPLE in the output byte order;
        # tiles difference over their OWN row width
        row_samples = (seg_w or w) * spp
        if depth == 8:
            out = bytearray(seg)
            for r0 in range(0, len(out), row_samples):
                for x in range(row_samples - 1, spp - 1, -1):
                    out[r0 + x] = (out[r0 + x]
                                   - seg[r0 + x - spp]) & 0xFF
            return bytes(out)
        vals = list(struct.unpack(
            endian + str(len(seg) // 2) + "H", seg))
        out16 = vals[:]
        for r0 in range(0, len(vals), row_samples):
            for x in range(row_samples - 1, spp - 1, -1):
                out16[r0 + x] = (vals[r0 + x]
                                 - vals[r0 + x - spp]) & 0xFFFF
        return struct.pack(endian + str(len(out16)) + "H", *out16)

    def finish(seg: bytes, seg_w: int) -> bytes:
        if predictor:
            seg = diff(seg, seg_w)
        if packbits:
            seg = pack(seg)
        elif lzw:
            seg = _tiff_lzw_encode(seg)
        return seg

    strips = []
    if tiles is not None:
        tw, th = tiles
        if tw < 1 or th < 1:
            raise ValueError("encode_tiff: tile dims must be >= 1")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        pad_row = [0] * (across * tw * spp)
        grid = [vals + [0] * (across * tw * spp - len(vals))
                for vals in sample_rows]
        grid += [pad_row] * (down * th - h)
        for ty in range(down):
            for tx in range(across):
                vals = []
                for y in range(ty * th, (ty + 1) * th):
                    vals.extend(grid[y][tx * tw * spp:
                                        (tx + 1) * tw * spp])
                strips.append(finish(pack_samples(vals), tw))
    else:
        for r0 in range(0, h, rps):
            strips.append(finish(b"".join(raw_rows[r0:r0 + rps]), w))
    n_strips = len(strips)
    entries = []                           # (tag, typ, cnt, values)
    entries.append((256, 4, 1, [w]))
    entries.append((257, 4, 1, [h]))
    entries.append((258, 3, spp, [depth] * spp))
    entries.append((259, 3, 1, [32773 if packbits
                                else 5 if lzw else 1]))
    entries.append((262, 3, 1, [1 if gray else 2]))
    entries.append((277, 3, 1, [spp]))
    if tiles is not None:
        entries.append((322, 4, 1, [tw]))
        entries.append((323, 4, 1, [th]))
    else:
        entries.append((278, 4, 1, [rps]))
    if predictor:
        entries.append((317, 3, 1, [2]))
    # offsets/counts filled after layout
    type_size = {3: 2, 4: 4}
    type_fmt = {3: "H", 4: "I"}
    # layout: header(8) + IFD + overflow area + strip data
    n_entries = len(entries) + 2           # + StripOffsets/ByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    over_off = ifd_off + ifd_size
    over = bytearray()

    def field(typ, cnt, values):
        nonlocal over
        total = type_size[typ] * cnt
        raw = struct.pack(endian + str(cnt) + type_fmt[typ], *values)
        if total <= 4:
            return raw + b"\x00" * (4 - total)
        off = over_off + len(over)
        over += raw
        return struct.pack(endian + "I", off)

    # strip data goes after the (not yet known) overflow area — do a
    # two-pass layout: first compute overflow size with placeholder
    # offsets, then fill real ones (overflow size is offset-
    # independent)
    counts = [len(s) for s in strips]
    probe = bytearray(over)
    for _, typ, cnt, values in entries:
        if type_size[typ] * cnt > 4:
            probe += struct.pack(endian + str(cnt) + type_fmt[typ],
                                 *values)
    for typ, cnt in ((4, n_strips), (4, n_strips)):
        if type_size[typ] * cnt > 4:
            probe += b"\x00" * (type_size[typ] * cnt)
    data_off = over_off + len(probe)
    offs, pos = [], data_off
    for c in counts:
        offs.append(pos)
        pos += c
    otag, ctag = (324, 325) if tiles is not None else (273, 279)
    all_entries = sorted(
        entries + [(otag, 4, n_strips, offs),
                   (ctag, 4, n_strips, counts)])
    out = bytearray(struct.pack(
        endian + "2sHI", b"II" if endian == "<" else b"MM", 42,
        ifd_off))
    out += struct.pack(endian + "H", n_entries)
    for tag, typ, cnt, values in all_entries:
        out += struct.pack(endian + "HHI", tag, typ, cnt)
        out += field(typ, cnt, values)
    out += struct.pack(endian + "I", 0)    # next-IFD pointer
    out += over
    assert len(out) == data_off, "encode_tiff layout drift"
    for s in strips:
        out += s
    return bytes(out)


def _wav_samples(payload: bytes):
    """Parse PCM WAV to (mono float64 samples in [-1, 1], rate, ch,
    bits). Raises ValueError on non-PCM or malformed RIFF — shared
    by decode_wav (feature vector) and audio_fingerprint."""
    import numpy as np
    if len(payload) < 44 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, sz = payload[pos:pos + 4], struct.unpack_from(
            "<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt)
    if audio_fmt != 1 or ch < 1 or bits not in (8, 16):
        raise ValueError("only 8/16-bit PCM supported")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2",
                          count=len(data) // 2).astype(np.float64)
        x /= 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    if x.size == 0:
        raise ValueError("empty data chunk")
    n_frames = x.size // ch
    mono = x[:n_frames * ch].reshape(n_frames, ch).mean(axis=1)
    return mono, rate, ch, bits


def decode_wav(payload: bytes) -> list[float]:
    """REAL audio decode: PCM WAV (8/16-bit) parsed with struct +
    numpy. 8-dim feature: [sample_rate, channels, bits, n_frames,
    duration_s, rms (0..1), peak (0..1), zero-crossing rate]. Raises
    ValueError on non-PCM or malformed RIFF."""
    import numpy as np
    mono, rate, ch, bits = _wav_samples(payload)
    n_frames = mono.size
    zc = (float(np.count_nonzero(np.diff(np.signbit(mono))))
          / max(n_frames - 1, 1))
    return [float(rate), float(ch), float(bits), float(n_frames),
            round(n_frames / rate, 6),
            round(float(np.sqrt((mono ** 2).mean())), 6),
            round(float(np.abs(mono).max()), 6), round(zc, 6)]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# Adam7 pass origins and steps, in pass order: (x0, y0, dx, dy).
# RFC 2083 §2.6: pass p covers pixels (x0 + i·dx, y0 + j·dy).
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _unfilter_lines(raw, off: int, n_rows: int, stride: int,
                    bpp: int):
    """Unfilter ``n_rows`` scanlines of ``stride`` bytes each from
    ``raw`` starting at ``off`` (each prefixed by its filter-type
    byte), per RFC 2083 §6.2-6.6: the left neighbor is one PIXEL
    (= bpp bytes) back, the up neighbor the previous line of the SAME
    sequence — which is why each Adam7 pass unfilters independently
    (prev resets to zeros). Returns ((n_rows, stride) uint8 array,
    next offset)."""
    import numpy as np
    if len(raw) < off + n_rows * (stride + 1):
        raise ValueError("truncated pixel data")
    out = np.empty((n_rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(n_rows):
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=off + 1)
        if ftype == 0:                       # None
            cur = line.copy()
        elif ftype == 2:                     # Up
            cur = line + prev
        elif ftype in (1, 3, 4):             # Sub / Average / Paeth
            # left-neighbor dependence → sequential per pixel, but
            # vectorized across the pixel's bytes (bpp-wide steps)
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(0, stride, bpp):
                a = cur[x - bpp:x] if x else np.zeros(bpp,
                                                      dtype=np.uint8)
                b = prev[x:x + bpp]
                seg = line[x:x + bpp]
                if ftype == 1:
                    cur[x:x + bpp] = seg + a
                elif ftype == 3:
                    cur[x:x + bpp] = seg + (
                        (a.astype(np.int32) + b) // 2).astype(np.uint8)
                else:
                    c = prev[x - bpp:x] if x else np.zeros(
                        bpp, dtype=np.uint8)
                    ai, bi, ci = (a.astype(np.int32),
                                  b.astype(np.int32),
                                  c.astype(np.int32))
                    p = ai + bi - ci
                    pa, pb, pc = (np.abs(p - ai), np.abs(p - bi),
                                  np.abs(p - ci))
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), ai,
                        np.where(pb <= pc, bi, ci)).astype(np.uint8)
                    cur[x:x + bpp] = seg + pred
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur
        prev = cur
        off += stride + 1
    return out, off


def _png_pixels(payload: bytes):
    """REAL compressed-image decode, stdlib-only: PNG = zlib inflate
    + per-row unfilter (RFC 2083), no codec library needed. Supports
    every legal depth/color combination — depths 1/2/4/8/16,
    non-interlaced AND Adam7 interlaced (r7), color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) — and returns a
    top-down (h, w, 3) RGB uint8 array (alpha dropped, gray
    expanded; 16-bit samples downsampled to their high byte, i.e.
    sample >> 8 — the standard 16→8 reduction; 1/2/4-bit gray scaled
    by 255/(2^d−1), the exact expansion since that ratio is an
    integer). Raises ValueError on illegal combinations and
    malformed chunks. Filtering operates on BYTES with the left
    neighbor one PIXEL (= bpp bytes) back — RFC 2083 §6.2 — so
    16-bit rows unfilter with bpp = channels*2 and sub-byte rows
    with bpp = 1 (the spec's round-up); each Adam7 pass is an
    independent filter sequence scattered to (y0 + j·dy, x0 + i·dx),
    with sub-byte passes bit-packed to their OWN byte-padded row
    width."""
    import zlib

    import numpy as np
    if len(payload) < 8 + 25 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        ln, = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln          # length + type + body + CRC
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if len(ihdr) != 13:
        raise ValueError("malformed IHDR")
    w, h, depth, color, comp, filt, inter = struct.unpack(
        ">IIBBBBB", ihdr)
    if comp != 0 or filt != 0 or inter not in (0, 1):
        raise ValueError("bad compression/filter/interlace method")
    # legal depth set per color type — PNG spec §11.2.2
    legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
             4: (8, 16), 6: (8, 16)}
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if nch is None or w == 0 or h == 0:
        raise ValueError("unsupported color type")
    if depth not in legal[color]:
        raise ValueError(f"depth {depth} invalid for color {color}")
    if color == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette image without valid PLTE")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        # corrupt deflate stream must surface as the module's decode
        # MISS contract (ValueError), not crash the Spark task
        raise ValueError(f"bad IDAT stream: {e}") from e
    if depth < 8:
        # sub-byte (always 1 channel: gray or palette): unfilter the
        # PACKED bytes with bpp=1 (spec round-up), then unpack bits
        # MSB-first into one sample per pixel
        def unpack(lines, wp):
            bits = np.unpackbits(lines, axis=1)[:, :wp * depth]
            weights = 1 << np.arange(depth - 1, -1, -1)
            return (bits.reshape(lines.shape[0], wp, depth)
                    @ weights).astype(np.uint8)

        if inter == 0:
            stride = (w * depth + 7) // 8
            lines, _ = _unfilter_lines(raw, 0, h, stride, 1)
            samples = unpack(lines, w)
        else:
            samples = np.zeros((h, w), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                wp = (w - x0 + dx - 1) // dx
                hp = (h - y0 + dy - 1) // dy
                if wp <= 0 or hp <= 0:
                    continue
                sp = (wp * depth + 7) // 8
                lines, off = _unfilter_lines(raw, off, hp, sp, 1)
                samples[y0::dy, x0::dx] = unpack(lines, wp)
        px = samples[:, :, None]
    else:
        bpp = nch * (depth // 8)  # filter step: one PIXEL of bytes
        if inter == 0:
            out, _ = _unfilter_lines(raw, 0, h, w * bpp, bpp)
        else:                     # Adam7: 7 independent sub-images
            img = np.zeros((h, w, bpp), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                wp = (w - x0 + dx - 1) // dx
                hp = (h - y0 + dy - 1) // dy
                if wp <= 0 or hp <= 0:
                    # empty passes contribute NO scanlines at all
                    # (not even filter bytes) — RFC 2083 §2.6
                    continue
                lines, off = _unfilter_lines(raw, off, hp, wp * bpp,
                                             bpp)
                img[y0::dy, x0::dx] = lines.reshape(hp, wp, bpp)
            out = img.reshape(h, w * bpp)
        if depth == 16:
            # big-endian uint16 samples → high byte (== sample >> 8)
            px = out.reshape(h, w, nch, 2)[:, :, :, 0]
        else:
            px = out.reshape(h, w, nch)
    if color == 3:                           # palette lookup
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    if depth < 8:
        # exact gray expansion: 255/(2^d−1) is an integer (255/85/17)
        px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    if nch == 2:                             # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]                      # RGB / RGBA → RGB


def decode_png(payload: bytes) -> list[float]:
    """PNG feature vector, same 8-dim contract as decode_bmp:
    [width, height, channels, mean_R, mean_G, mean_B (0..1),
    brightness (0..1), n_pixels]."""
    if payload[:8] != _PNG_SIG or len(payload) < 33:
        raise ValueError("not a PNG")
    color = payload[8 + 8 + 9]               # IHDR color type byte
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color, 0)
    px = _png_pixels(payload)
    h, w = px.shape[0], px.shape[1]
    means = px.astype("float64").mean(axis=(0, 1)) / 255.0
    return [float(w), float(h), float(nch),
            round(float(means[0]), 6), round(float(means[1]), 6),
            round(float(means[2]), 6),
            round(float(means.mean()), 6), float(w * h)]


# ---------------------------------------------------------------- JPEG
# Baseline sequential JPEG (ITU-T T.81 SOF0/SOF1), stdlib+numpy only:
# marker parse, DQT/DHT tables from the stream, Huffman entropy
# decode with byte unstuffing, restart intervals, dequantize, 2-D
# IDCT (orthonormal matrix form), chroma upsampling, YCbCr->RGB.
# Arithmetic coding and the lossless/hierarchical SOFs raise
# ValueError and fall back to the histogram pseudo-feature like any
# undecodable payload; baseline AND progressive Huffman decode.

_ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
       12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

_IDCT_M = None


def _dct_matrix():
    """Orthonormal 8-point DCT-II matrix M (M[u, x]); 2-D IDCT of a
    coefficient block B is M.T @ B @ M."""
    global _IDCT_M
    if _IDCT_M is None:
        import numpy as np
        x = np.arange(8)
        m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
        a = np.full(8, np.sqrt(2.0 / 8.0))
        a[0] = np.sqrt(1.0 / 8.0)
        _IDCT_M = a[:, None] * m
    return _IDCT_M


def _huff_canonical(counts: list[int], values: list[int]) -> dict:
    """(length, code) -> value map from the DHT wire form (16 length
    counts + values in canonical order)."""
    table, code, vi = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over the entropy-coded segment with FF00
    unstuffing; `restart()` byte-aligns and consumes the expected
    RSTn marker."""

    def __init__(self, data: bytes, pos: int):
        self.d, self.p, self.b, self.n = data, pos, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            byte = self.d[self.p]
            self.p += 1
            if byte == 0xFF:
                nxt = self.d[self.p]
                if nxt != 0x00:
                    raise ValueError("marker inside entropy data")
                self.p += 1
            self.b, self.n = byte, 8
        self.n -= 1
        return (self.b >> self.n) & 1

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def huff(self, table: dict) -> int:
        ln, code = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            got = table.get((ln, code))
            if got is not None:
                return got
        raise ValueError("bad Huffman code")

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, idx: int) -> None:
        self.n = 0                           # discard partial byte
        if self.d[self.p] != 0xFF or \
                self.d[self.p + 1] != 0xD0 + (idx & 7):
            raise ValueError("missing restart marker")
        self.p += 2


def _jpeg_pixels(payload: bytes):
    """Decode a JPEG (baseline sequential SOF0/SOF1 or progressive
    SOF2 Huffman) to a top-down (h, w, 3) uint8 RGB array (grayscale
    replicated across channels). Raises ValueError — and ONLY
    ValueError — on anything else (arithmetic coding, lossless/
    hierarchical frames, corrupt streams); truncated streams surface
    as IndexError internally and are converted here so every
    caller's fallback path stays a single exception type (review
    r9)."""
    try:
        return _jpeg_decode(payload)[0]
    except IndexError:
        raise ValueError("truncated JPEG") from None


def _entropy_end(d: bytes, pos: int) -> int:
    """Position of the first real marker (not FF00 stuffing, not
    RSTn) at or after ``pos`` — where a progressive scan's entropy
    data ends and the marker walk resumes."""
    q = pos
    while q < len(d) - 1:
        if d[q] == 0xFF and d[q + 1] != 0x00 \
                and not 0xD0 <= d[q + 1] <= 0xD7:
            return q
        q += 1
    return len(d)


def _jpeg_prog_geometry(h: int, w: int, comps):
    """Padded coefficient arrays + real block dims for a progressive
    frame (validated up front — scans arrive before the shared tail
    would have run the checks)."""
    import numpy as np
    if h == 0 or w == 0:
        raise ValueError("empty frame")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if not 1 <= c["h"] <= 4 or not 1 <= c["v"] <= 4 \
                or hmax % c["h"] or vmax % c["v"]:
            raise ValueError("unsupported sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nbdims, coefs = [], []
    for c in comps:
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        nbdims.append((-(-cw // 8), -(-ch // 8)))
        coefs.append(np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              dtype=np.int64))
    return (hmax, vmax, mcux, mcuy), nbdims, coefs


def _jpeg_prog_scan(d: bytes, pos: int, coefs, scomps, hts,
                    Ss: int, Se: int, Ah: int, Al: int, ri: int,
                    geom, nbdims) -> None:
    """Decode ONE progressive scan's entropy-coded data (T.81 G.2)
    into the per-component coefficient arrays: DC first/refinement
    (interleaved or single-component), AC first/refinement with
    EOB-run coding (single-component by definition). ``scomps`` is
    [(ci, comp, td, ta)] in scan order; ``coefs[ci]`` is the padded
    (blocks_y, blocks_x, 64) natural-order int array; ``nbdims[ci]``
    the component's REAL block dims for non-interleaved scans."""
    hmax, vmax, mcux, mcuy = geom
    br = _JpegBits(d, pos)
    eobrun, n_rst, units = 0, 0, 0
    preds = {ci: 0 for ci, _, _, _ in scomps}
    if Ss == 0:
        if Se != 0:
            raise ValueError("bad progressive scan "
                             "(DC scan with Se != 0)")
        if Ah == 0:
            for ci, c, td, _ in scomps:
                if (0, td) not in hts:
                    raise ValueError("missing Huffman table")
    else:
        if len(scomps) != 1:
            raise ValueError("bad progressive scan "
                             "(interleaved AC scan)")
        if Se > 63 or Se < Ss:
            raise ValueError("bad progressive scan (band)")
        if (1, scomps[0][3]) not in hts:
            raise ValueError("missing Huffman table")

    def dc_unit(cf, ci, td):
        if Ah == 0:
            s = br.huff(hts[(0, td)])
            if s > 11:
                # T.81 limits 8-bit DC diff categories to 0..11; a
                # corrupt DHT value here would build an arbitrarily
                # wide Python int and overflow the int64 coefficient
                # store as OverflowError, escaping the ValueError-only
                # fallback contract (review r11 fuzz finding)
                raise ValueError("bad DC category")
            preds[ci] += br.receive_extend(s)
            cf[0] = preds[ci] << Al
        elif br.bit():
            cf[0] = int(cf[0]) | (1 << Al)

    def ac_first(cf, hac):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = Ss
        while k <= Se:
            rs = br.huff(hac)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.receive(r)
                    return
                k += 16
                continue
            k += r
            if k > Se:
                raise ValueError("AC run overflow")
            cf[_ZZ[k]] = br.receive_extend(s) << Al
            k += 1

    def ac_refine(cf, hac):
        # G.2 / the jdphuff shape: new ±1<<Al insertions run-length
        # coded over ZERO-HISTORY positions only; already-significant
        # coefficients read one correction bit in passing; EOB runs
        # still carry the current block's remaining correction bits
        nonlocal eobrun
        p1, m1 = 1 << Al, -(1 << Al)
        k = Ss
        if eobrun == 0:
            while k <= Se:
                rs = br.huff(hac)
                r, s = rs >> 4, rs & 15
                if s:
                    if s != 1:
                        raise ValueError("bad AC refinement code")
                    s = p1 if br.bit() else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                while k <= Se:
                    z = _ZZ[k]
                    v = int(cf[z])
                    if v != 0:
                        if br.bit() and (v & p1) == 0:
                            cf[z] = v + (p1 if v >= 0 else m1)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if s and k <= Se:
                    cf[_ZZ[k]] = s
                k += 1
        if eobrun > 0:
            while k <= Se:
                z = _ZZ[k]
                v = int(cf[z])
                if v != 0 and br.bit() and (v & p1) == 0:
                    cf[z] = v + (p1 if v >= 0 else m1)
                k += 1
            eobrun -= 1

    def maybe_restart():
        nonlocal eobrun, n_rst, preds
        if ri and units and units % ri == 0:
            br.restart(n_rst)
            n_rst = (n_rst + 1) & 7
            eobrun = 0
            preds = {ci: 0 for ci, _, _, _ in preds_keys}

    preds_keys = list(scomps)
    if Ss == 0 and len(scomps) > 1:
        # interleaved DC scan: MCU order, v×h blocks per component
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci, c, td, _ in scomps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_unit(coefs[ci][my * c["v"] + by,
                                              mx * c["h"] + bx],
                                    ci, td)
                units += 1
    else:
        # non-interleaved: raster order over the REAL block grid
        ci, c, td, ta = scomps[0]
        bw, bh = nbdims[ci]
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                cf = coefs[ci][by, bx]
                if Ss == 0:
                    dc_unit(cf, ci, td)
                elif Ah == 0:
                    ac_first(cf, hts[(1, ta)])
                else:
                    ac_refine(cf, hts[(1, ta)])
                units += 1


def _jpeg_finish(planes, comps, h, w, hmax, vmax):
    """Shared baseline/progressive tail: upsample each component
    plane to full resolution, crop, and convert to RGB (grayscale
    replicated)."""
    import numpy as np
    full = []
    for ci, c in enumerate(comps):
        pl = np.repeat(np.repeat(planes[ci], vmax // c["v"], axis=0),
                       hmax // c["h"], axis=1)
        full.append(pl[:h, :w])
    if len(comps) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8), 1
    if len(comps) != 3:
        raise ValueError(f"unsupported component count {len(comps)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.dstack([y + 1.402 * cr,
                     y - 0.344136 * cb - 0.714136 * cr,
                     y + 1.772 * cb])
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), 3


def _jpeg_decode(payload: bytes):
    """(pixels, n_components) — the full parse behind _jpeg_pixels
    and decode_jpeg (which needs the SOF component count without a
    second marker walk; review r9). Baseline sequential (SOF0/SOF1)
    and progressive (SOF2) Huffman streams both decode; progressive
    accumulates coefficients across the scan script (spectral
    selection + successive approximation, EOB runs, restarts) and
    runs one vectorized IDCT at the end."""
    import numpy as np
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    p, qt, hts, ri, frame = 2, {}, {}, 0, None
    scan = None
    progressive = False
    coefs = geom = nbdims = None
    while p < len(d) - 1:
        if d[p] != 0xFF:
            raise ValueError("bad marker alignment")
        m = d[p + 1]
        p += 2
        if m in (0x01, 0xD8) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        if p + 2 > len(d):
            raise ValueError("truncated segment")
        seg_len = (d[p] << 8) | d[p + 1]
        seg = d[p + 2:p + seg_len]
        if m == 0xDB:                                   # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    vals = [(seg[i + 2 * j] << 8) | seg[i + 2 * j + 1]
                            for j in range(64)]
                    i += 128
                else:
                    vals = list(seg[i:i + 64])
                    i += 64
                tab = np.zeros(64)
                for j, z in enumerate(_ZZ):
                    tab[z] = vals[j]
                qt[tq] = tab.reshape(8, 8)
        elif m == 0xC4:                                 # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                nv = sum(counts)
                values = list(seg[i + 17:i + 17 + nv])
                hts[(tc, th)] = _huff_canonical(counts, values)
                i += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):               # SOF0/SOF1/SOF2
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = m == 0xC2
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                o = 6 + 3 * c
                comps.append({"id": seg[o], "h": seg[o + 1] >> 4,
                              "v": seg[o + 1] & 15, "q": seg[o + 2]})
            frame = (h, w, comps)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/progressive Huffman JPEG supported")
        elif m == 0xDD:                                 # DRI
            ri = (seg[0] << 8) | seg[1]
        elif m == 0xDA:                                 # SOS
            ns = seg[0]
            sel = {}
            for c in range(ns):
                sel[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4,
                                       seg[2 + 2 * c] & 15)
            if not progressive:
                scan = (sel, p + seg_len)
                break
            # progressive: decode THIS scan now, keep walking — DHT
            # and DRI segments may redefine tables between scans
            if frame is None:
                raise ValueError("SOS before SOF")
            h, w, comps = frame
            if coefs is None:
                geom, nbdims, coefs = _jpeg_prog_geometry(
                    h, w, comps)
            Ss = seg[1 + 2 * ns]
            Se = seg[2 + 2 * ns]
            Ah = seg[3 + 2 * ns] >> 4
            Al = seg[3 + 2 * ns] & 15
            scomps = []
            for ci, c in enumerate(comps):
                if c["id"] in sel:
                    td, ta = sel[c["id"]]
                    scomps.append((ci, c, td, ta))
            if len(scomps) != ns:
                raise ValueError("scan selects unknown component")
            data_start = p + seg_len
            _jpeg_prog_scan(d, data_start, coefs, scomps,
                            hts, Ss, Se, Ah, Al, ri, geom, nbdims)
            p = _entropy_end(d, data_start)
            continue
        p += seg_len
    if frame is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("empty frame")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        # T.81 allows 1..4; integer-ratio upsampling additionally
        # needs each factor to divide the max (true of every common
        # subsampling: 4:4:4, 4:2:2, 4:2:0, 4:1:1). Factor 0 would
        # divide-by-zero in the upsample repeat (review r9).
        if not 1 <= c["h"] <= 4 or not 1 <= c["v"] <= 4 \
                or hmax % c["h"] or vmax % c["v"]:
            raise ValueError("unsupported sampling factors")
    M = _dct_matrix()
    if progressive:
        if coefs is None:
            raise ValueError("missing SOF/SOS")
        planes = []
        for ci, c in enumerate(comps):
            if c["q"] not in qt:
                raise ValueError("missing table for component")
            q64 = qt[c["q"]].reshape(64)
            arr = coefs[ci].astype(float) * q64
            by, bx = arr.shape[0], arr.shape[1]
            blocks = arr.reshape(by, bx, 8, 8)
            px = np.einsum("ij,yxjk,kl->yxil", M.T, blocks,
                           M) + 128.0
            planes.append(px.transpose(0, 2, 1, 3)
                          .reshape(by * 8, bx * 8))
        return _jpeg_finish(planes, comps, h, w, hmax, vmax)
    if scan is None:
        raise ValueError("missing SOF/SOS")
    sel, pos = scan
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
              for c in comps]
    for c in comps:
        if c["q"] not in qt or c["id"] not in sel:
            raise ValueError("missing table for component")
        dc_id, ac_id = sel[c["id"]]
        if (0, dc_id) not in hts or (1, ac_id) not in hts:
            raise ValueError("missing Huffman table")
    br = _JpegBits(d, pos)
    pred = [0] * len(comps)
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if ri and mcu_i and mcu_i % ri == 0:
                br.restart(n_rst)
                n_rst = (n_rst + 1) & 7
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                hdc = hts[(0, sel[c["id"]][0])]
                hac = hts[(1, sel[c["id"]][1])]
                q = qt[c["q"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        s = br.huff(hdc)
                        pred[ci] += br.receive_extend(s)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(hac)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break              # EOB
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            coef[_ZZ[k]] = br.receive_extend(s)
                            k += 1
                        blk = coef.reshape(8, 8) * q
                        px = M.T @ blk @ M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
    return _jpeg_finish(planes, comps, h, w, hmax, vmax)


class _JpegBitWriter:
    """MSB-first bit writer with FF00 stuffing — shared by the
    baseline and progressive encoders."""

    def __init__(self):
        self.buf, self.acc, self.n = bytearray(), 0, 0

    def bits(self, v, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0)
                self.acc, self.n = 0, 0

    def align(self):
        while self.n:
            self.bits(1, 1)


def _jpeg_plan(px_rows, sub, qscale):
    """Shared encoder prep for the baseline and progressive twins:
    color transform, subsampling, edge padding, quant tables.
    Returns (h, w, comps=[(padded_plane, hf, vf, qtable)], qy, qc,
    gray, hmax, vmax)."""
    import numpy as np

    QY = np.array([
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99], dtype=float).reshape(8, 8)
    QC = np.array([
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99], dtype=float).reshape(8, 8)
    qy = np.clip(np.round(QY * qscale), 1, 255)
    qc = np.clip(np.round(QC * qscale), 1, 255)
    M = _dct_matrix()
    gray = sub == "gray"
    h, w = len(px_rows), len(px_rows[0])
    if gray:
        y_plane = np.array(px_rows, dtype=float)
        hmax = vmax = 1
    else:
        rgb = np.array(px_rows, dtype=float)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y_plane = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        hmax = vmax = 2 if sub == "420" else 1
    H = -(-h // (8 * vmax)) * 8 * vmax
    W = -(-w // (8 * hmax)) * 8 * hmax

    def pad(a):
        return np.pad(a, ((0, H - h), (0, W - w)), mode="edge")

    if gray:
        comps = [(pad(y_plane), 1, 1, qy)]
    elif sub == "420":
        def half(a):
            p = pad(a)
            return (p[0::2, 0::2] + p[0::2, 1::2]
                    + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        comps = [(pad(y_plane), 2, 2, qy),
                 (half(cb), 1, 1, qc), (half(cr), 1, 1, qc)]
    else:
        comps = [(pad(y_plane), 1, 1, qy),
                 (pad(cb), 1, 1, qc), (pad(cr), 1, 1, qc)]
    return h, w, comps, qy, qc, gray, hmax, vmax


def _jpeg_headers(out, h, w, comps, qy, qc, gray, sof_marker,
                  dht_specs, restart):
    """Emit DQT + SOF + DHT (+ DRI) segments. ``dht_specs`` is
    [(tc, th, counts, values)]."""

    def seg(marker, body):
        out.extend(bytes([0xFF, marker])
                   + struct.pack(">H", len(body) + 2) + body)

    def qt_body(tq, q):
        return bytes([tq]) + bytes(int(q.flat[_ZZ[k]])
                                   for k in range(64))

    seg(0xDB, qt_body(0, qy) + (b"" if gray else qt_body(1, qc)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for i, (_, hf, vf, _q) in enumerate(comps):
        sof += bytes([i + 1, (hf << 4) | vf, 0 if i == 0 else 1])
    seg(sof_marker, sof)
    body = b"".join(bytes([(tc << 4) | th]) + bytes(counts)
                    + bytes(values)
                    for tc, th, counts, values in dht_specs)
    seg(0xC4, body)
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    return seg


def encode_jpeg_baseline(px_rows, sub="444", qscale=0.2,
                         restart=None) -> bytes:
    """Minimal baseline JPEG ENCODER — the deterministic synthetic-
    corpus twin of the decode kernel (and the fixture generator for
    its tests): standard Annex-K quantization tables
    scaled by ``qscale``, fixed-length canonical Huffman tables
    written into the stream via DHT (4-bit DC codes / 8-bit AC codes
    — trivially canonical, still a fully standard baseline file),
    FF-stuffed entropy data, optional restart intervals. ``sub`` is
    "444", "420" (2x2-averaged chroma), or "gray" (rows of ints
    instead of (r,g,b))."""
    import numpy as np

    h, w, comps, qy, qc, gray, hmax, vmax = _jpeg_plan(
        px_rows, sub, qscale)
    M = _dct_matrix()
    H, W = comps[0][0].shape
    ncomp = len(comps)

    dc_vals = list(range(12))
    ac_vals = [0x00, 0xF0] + [(rr << 4) | s
                              for rr in range(16) for s in range(1, 11)]
    dc_code = {v: i for i, v in enumerate(dc_vals)}
    ac_code = {v: i for i, v in enumerate(ac_vals)}
    dc_counts = [0] * 16
    dc_counts[3] = 12
    ac_counts = [0] * 16
    ac_counts[7] = 162

    def cat(v):
        s, a = 0, abs(v)
        while a:
            s += 1
            a >>= 1
        return s

    bw = _JpegBitWriter()

    def encode_block(block, q, pred):
        coef = np.round((M @ (block - 128.0) @ M.T) / q)
        zz = [int(np.clip(coef.flat[_ZZ[k]], -1023, 1023))
              for k in range(64)]
        diff = zz[0] - pred
        s = cat(diff)
        bw.bits(dc_code[s], 4)
        if s:
            bw.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
        last = max((k for k in range(1, 64) if zz[k]), default=0)
        run = 0
        for k in range(1, last + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                bw.bits(ac_code[0xF0], 8)
                run -= 16
            s = cat(zz[k])
            bw.bits(ac_code[(run << 4) | s], 8)
            bw.bits(zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1, s)
            run = 0
        if last < 63:
            bw.bits(ac_code[0x00], 8)
        return zz[0]

    preds = [0] * ncomp
    nmcux, nmcuy = W // (8 * hmax), H // (8 * vmax)
    mcu_i, rst = 0, 0
    for my in range(nmcuy):
        for mx in range(nmcux):
            if restart and mcu_i and mcu_i % restart == 0:
                bw.align()
                bw.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * ncomp
            for ci, (plane, hf, vf, q) in enumerate(comps):
                for by in range(vf):
                    for bx in range(hf):
                        y0, x0 = (my * vf + by) * 8, (mx * hf + bx) * 8
                        preds[ci] = encode_block(
                            plane[y0:y0 + 8, x0:x0 + 8], q, preds[ci])
            mcu_i += 1
    bw.align()

    out = bytearray(b"\xff\xd8")
    dht_specs = [(0, 0, dc_counts, dc_vals),
                 (1, 0, ac_counts, ac_vals)]
    if not gray:
        dht_specs += [(0, 1, dc_counts, dc_vals),
                      (1, 1, ac_counts, ac_vals)]
    seg = _jpeg_headers(out, h, w, comps, qy, qc, gray, 0xC0,
                        dht_specs, restart)
    sos = bytes([ncomp])
    for i in range(ncomp):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(px_rows, sub="444", qscale=0.2,
                            restart=None, script=None) -> bytes:
    """Progressive (SOF2) JPEG ENCODER — the fixture generator for
    the progressive decode path, exercising the full scan-script
    feature space: interleaved DC first scan with point transform,
    DC refinement bits, per-component AC first scans with spectral
    selection + EOB-run coding, and AC successive-approximation
    refinement scans (the correction-bit protocol of T.81 G.1.2.3,
    the jcphuff shape). The default ``script`` is the libjpeg
    default progression. The quantized coefficients are IDENTICAL
    to ``encode_jpeg_baseline``'s at the same sub/qscale, so
    decode(progressive) must equal decode(baseline)
    pixel-for-pixel — the round-trip certificate pinned by test.

    ``script`` entries are (comp_indices, Ss, Se, Ah, Al)."""
    import numpy as np

    h, w, comps, qy, qc, gray, hmax, vmax = _jpeg_plan(
        px_rows, sub, qscale)
    M = _dct_matrix()
    # quantized coefficient blocks per component, natural order
    blocks, nbdims = [], []
    for plane, hf, vf, q in comps:
        by, bx = plane.shape[0] // 8, plane.shape[1] // 8
        b8 = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        coef = np.round(
            np.einsum("ij,yxjk,kl->yxil", M, b8 - 128.0, M.T) / q)
        blocks.append(np.clip(coef, -1023, 1023)
                      .astype(np.int64).reshape(by, bx, 64))
        cw = -(-(w * hf) // hmax)
        ch = -(-(h * vf) // vmax)
        nbdims.append((-(-cw // 8), -(-ch // 8)))
    mcux = comps[0][0].shape[1] // (8 * hmax)
    mcuy = comps[0][0].shape[0] // (8 * vmax)
    if script is None:
        # the libjpeg default progression (DC Al=1 → luma AC split
        # bands at Al=2 → chroma AC at Al=1 → SA refinements to 0)
        if gray:
            script = [((0,), 0, 0, 0, 1), ((0,), 1, 5, 0, 2),
                      ((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1),
                      ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0)]
        else:
            script = [((0, 1, 2), 0, 0, 0, 1), ((0,), 1, 5, 0, 2),
                      ((1,), 1, 63, 0, 1), ((2,), 1, 63, 0, 1),
                      ((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1),
                      ((0, 1, 2), 0, 0, 1, 0), ((1,), 1, 63, 1, 0),
                      ((2,), 1, 63, 1, 0), ((0,), 1, 63, 1, 0)]

    dc_vals = list(range(12))
    dc_counts = [0] * 16
    dc_counts[3] = 12
    # progressive needs the EOBn symbols (r<<4, r=1..14) the
    # baseline table omits; 176 fixed 8-bit codes stay canonical
    ac_vals = ([0x00] + [r << 4 for r in range(1, 15)] + [0xF0]
               + [(r << 4) | s for r in range(16)
                  for s in range(1, 11)])
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_vals)
    dc_code = {v: i for i, v in enumerate(dc_vals)}
    ac_code = {v: i for i, v in enumerate(ac_vals)}

    def cat(v):
        s, a = 0, abs(v)
        while a:
            s += 1
            a >>= 1
        return s

    out = bytearray(b"\xff\xd8")
    dht_specs = [(0, 0, dc_counts, dc_vals),
                 (1, 0, ac_counts, ac_vals)]
    if not gray:
        dht_specs += [(0, 1, dc_counts, dc_vals),
                      (1, 1, ac_counts, ac_vals)]
    seg = _jpeg_headers(out, h, w, comps, qy, qc, gray, 0xC2,
                        dht_specs, restart)

    for comp_ids, Ss, Se, Ah, Al in script:
        bw = _JpegBitWriter()
        eobrun, bebits = 0, []
        preds = {i: 0 for i in comp_ids}
        units, n_rst = 0, 0

        def flush_eob():
            # EOB-run symbol + its extra bits, then the correction
            # bits buffered across the run's blocks (decoder reads
            # them in each skipped block's eobrun section)
            nonlocal eobrun, bebits
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                bw.bits(ac_code[nbits << 4], 8)
                if nbits:
                    bw.bits(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0
            for b in bebits:
                bw.bits(b, 1)
            bebits = []

        def maybe_restart():
            nonlocal units, n_rst, preds
            if restart and units and units % restart == 0:
                flush_eob()
                bw.align()
                bw.buf += bytes([0xFF, 0xD0 + (n_rst & 7)])
                n_rst = (n_rst + 1) & 7
                preds = {i: 0 for i in preds}

        def dc_unit(ci, cf):
            if Ah == 0:
                t = int(cf[0]) >> Al          # arithmetic shift
                diff = t - preds[ci]
                preds[ci] = t
                s = cat(diff)
                bw.bits(dc_code[s], 4)
                if s:
                    bw.bits(diff if diff >= 0
                            else diff + (1 << s) - 1, s)
            else:
                bw.bits((int(cf[0]) >> Al) & 1, 1)

        def ac_first_block(cf):
            # magnitude point transform (G.1.2.2): |c| >> Al, sign
            # kept; run-length + EOB-run coding over the band
            nonlocal eobrun
            vals = []
            for k in range(Ss, Se + 1):
                c0 = int(cf[_ZZ[k]])
                a = abs(c0) >> Al
                vals.append(a if c0 >= 0 else -a)
            last = max((i for i, v in enumerate(vals) if v),
                       default=-1)
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                return
            flush_eob()
            r = 0
            for i in range(last + 1):
                v = vals[i]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    bw.bits(ac_code[0xF0], 8)
                    r -= 16
                s = cat(v)
                bw.bits(ac_code[(r << 4) | s], 8)
                bw.bits(v if v >= 0 else v + (1 << s) - 1, s)
                r = 0
            if last < Se - Ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()

        def ac_refine_block(cf):
            # the jcphuff encode_mcu_AC_refine shape: runs count
            # zero-HISTORY positions; already-significant coefs
            # buffer one correction bit each, emitted after the next
            # symbol (or appended to the EOB run)
            nonlocal eobrun, bebits
            absv, eob_idx = [], -1
            for k in range(Ss, Se + 1):
                a = abs(int(cf[_ZZ[k]])) >> Al
                absv.append(a)
                if a == 1:
                    eob_idx = len(absv) - 1
            r, br_bits = 0, []
            for idx, temp in enumerate(absv):
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and idx <= eob_idx:
                    flush_eob()
                    bw.bits(ac_code[0xF0], 8)
                    r -= 16
                    for b in br_bits:
                        bw.bits(b, 1)
                    br_bits = []
                if temp > 1:
                    br_bits.append(temp & 1)
                    continue
                flush_eob()
                bw.bits(ac_code[(r << 4) | 1], 8)
                bw.bits(1 if int(cf[_ZZ[Ss + idx]]) >= 0 else 0, 1)
                for b in br_bits:
                    bw.bits(b, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                bebits.extend(br_bits)
                if eobrun == 0x7FFF or len(bebits) > 900:
                    flush_eob()

        if Ss == 0 and len(comp_ids) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci in comp_ids:
                        _, hf, vf, _q = comps[ci]
                        for iy in range(vf):
                            for ix in range(hf):
                                dc_unit(ci, blocks[ci][
                                    my * vf + iy, mx * hf + ix])
                    units += 1
        else:
            ci = comp_ids[0]
            bwid, bhei = nbdims[ci]
            for iy in range(bhei):
                for ix in range(bwid):
                    maybe_restart()
                    cf = blocks[ci][iy, ix]
                    if Ss == 0:
                        dc_unit(ci, cf)
                    elif Ah == 0:
                        ac_first_block(cf)
                    else:
                        ac_refine_block(cf)
                    units += 1
        flush_eob()
        bw.align()
        sos = bytes([len(comp_ids)])
        for i in comp_ids:
            t = 0 if i == 0 else 1
            sos += bytes([i + 1, (t << 4) | t])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        seg(0xDA, sos)
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(payload: bytes) -> list[float]:
    """REAL compressed-photo decode: baseline AND progressive JPEG
    (the last common container; PNG/BMP/WAV kernels were already
    real) parsed with stdlib + numpy — same 8-dim contract as
    decode_bmp/decode_png:
    [width, height, channels, mean_R, mean_G, mean_B (0..1),
    brightness (0..1), n_pixels]."""
    try:
        px, nch = _jpeg_decode(payload)
    except IndexError:
        raise ValueError("truncated JPEG") from None
    h, w = px.shape[0], px.shape[1]
    means = px.astype("float64").mean(axis=(0, 1)) / 255.0
    return [float(w), float(h), float(nch),
            round(float(means[0]), 6), round(float(means[1]), 6),
            round(float(means[2]), 6),
            round(float(means.mean()), 6), float(w * h)]


def _gif_lzw(data: bytes, min_code: int, n_out: int) -> list:
    """GIF-variant LZW decompression (LSB-first bit packing, CLEAR /
    END codes, 12-bit code cap): returns exactly ``n_out`` color
    indices or raises ValueError. Pure stdlib — the dictionary is a
    dict of int → tuple, grown one entry per decoded code."""
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    table = {i: (i,) for i in range(clear)}
    next_code = end + 1
    out: list = []
    prev = None
    bitpos = 0
    total_bits = len(data) * 8
    while len(out) < n_out:
        if bitpos + code_size > total_bits:
            raise ValueError("truncated GIF LZW stream")
        byte = bitpos >> 3
        val = (int.from_bytes(data[byte:byte + 3], "little")
               >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if val == clear:
            table = {i: (i,) for i in range(clear)}
            next_code = end + 1
            code_size = min_code + 1
            prev = None
            continue
        if val == end:
            break
        if prev is None:
            entry = table.get(val)
            if entry is None:
                raise ValueError("bad GIF LZW start code")
        else:
            if val in table:
                entry = table[val]
            elif val == next_code:
                entry = prev + (prev[0],)      # the KwKwK case
            else:
                raise ValueError("bad GIF LZW code")
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        prev = entry
    if len(out) < n_out:
        raise ValueError("truncated GIF image data")
    return out[:n_out]


def encode_gif(sw: int, sh: int, palette, frames) -> bytes:
    """GIF89a encoder (r13 — the fixture/round-trip counterpart of
    ``encode_jpeg_baseline``, and the decoder's test oracle): one
    shared global color table (``palette`` = RGB tuples) and one
    image per ``frames`` entry ``(left, top, idx_rows, transp,
    disposal)`` — idx_rows are palette indices, ``transp`` an
    optional transparent index, ``disposal`` the GCE disposal
    method. Literal-code LZW whose code-size growth mirrors the
    decoder's dictionary growth (the encoder never emits dictionary
    codes — the simplest valid stream). decode(encode(x)) recovers
    pixels exactly (pinned by test)."""
    if not palette or len(palette) > 256:
        raise ValueError("encode_gif: palette must hold 1..256 "
                         "colors")
    bits = max(1, (len(palette) - 1).bit_length())
    n_field = max(0, bits - 1)
    entries = 2 << n_field
    min_code = max(2, bits)
    gct = b"".join(bytes(c) for c in palette)
    gct += b"\x00" * (entries * 3 - len(gct))
    out = bytearray(
        b"GIF89a"
        + struct.pack("<HHBBB", sw, sh, 0x80 | n_field, 0, 0) + gct)
    for left, top, rows, transp, disposal in frames:
        h, w = len(rows), len(rows[0])
        if left + w > sw or top + h > sh:
            raise ValueError("encode_gif: frame outside the canvas")
        if transp is not None or disposal:
            packed = (disposal & 7) << 2 | (1 if transp is not None
                                            else 0)
            out += (b"\x21\xf9\x04"
                    + bytes([packed, 0, 0, transp or 0]) + b"\x00")
        out += (b"\x2C" + struct.pack("<HHHH", left, top, w, h)
                + bytes([0, min_code]))
        clear, end_code = 1 << min_code, (1 << min_code) + 1
        cs, nxt, first = min_code + 1, end_code + 1, True
        codes = [(clear, min_code + 1)]
        for idx in (i for r in rows for i in r):
            if not 0 <= idx < len(palette):
                raise ValueError("encode_gif: index outside palette")
            codes.append((idx, cs))
            if first:
                first = False
            else:
                nxt += 1
                if nxt == (1 << cs) and cs < 12:
                    cs += 1
                if nxt >= 3500:
                    codes.append((clear, cs))
                    cs, nxt, first = min_code + 1, end_code + 1, True
        codes.append((end_code, cs))
        acc = nacc = 0
        data = bytearray()
        for code, size in codes:
            acc |= code << nacc
            nacc += size
            while nacc >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
        if nacc:
            data.append(acc & 0xFF)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + bytes(chunk)
        out += b"\x00"
    return bytes(out + b"\x3B")


def _gif_frame_iter(payload: bytes):
    """Single-pass composited-frame generator over a GIF87a/89a
    (r13 review: the per-frame samplers previously called
    ``_gif_pixels(frame=k)`` per sample, re-decoding every earlier
    frame each time — O(frames²) LZW work; this yields each
    composited frame ONCE). Yields ``(k, canvas)`` where ``canvas``
    is REUSED storage — consume or ``.copy()`` before advancing.

    Robustness (r13 review): the canvas allocates only after
    validation and is size-capped (a 14-byte payload declaring a
    65535×65535 screen must be a ValueError, not a 12 GiB
    MemoryError that escapes the degrade-never-crash guards);
    broken-encoder geometry is tolerated like viewers do — a zero
    logical screen takes the first frame's extent, and a frame rect
    overhanging the canvas is CLIPPED, not rejected."""
    import numpy as np
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 7))
        gct = payload[pos:pos + n]
        if len(gct) < n:
            raise ValueError("truncated GIF color table")
        pos += n
    if gct is not None and 3 * bg_idx + 3 <= len(gct):
        bg = np.frombuffer(gct[3 * bg_idx:3 * bg_idx + 3],
                           dtype=np.uint8)
    else:
        bg = np.zeros(3, dtype=np.uint8)
    canvas = None
    k = 0
    transp, disposal = None, 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                      # extension sub-blocks
            label = payload[pos + 1] if pos + 1 < len(payload) else 0
            pos += 2
            first_block = None
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                if first_block is None:
                    first_block = payload[pos + 1:pos + 1 + ln]
                pos += ln + 1
            pos += 1
            if label == 0xF9 and first_block \
                    and len(first_block) >= 4:
                # Graphic Control Extension: governs the NEXT image
                gp = first_block[0]
                disposal = (gp >> 2) & 7
                transp = first_block[3] if gp & 1 else None
        elif b == 0x2C:                    # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            left, top, iw, ih = struct.unpack_from("<HHHH", payload,
                                                   pos + 1)
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 3 * (2 << (ipacked & 7))
                ct = payload[pos:pos + n]
                if len(ct) < n:
                    raise ValueError("truncated GIF color table")
                pos += n
            if ct is None:
                raise ValueError("GIF image has no color table")
            if not (0 < iw and 0 < ih):
                raise ValueError("empty GIF image")
            if canvas is None:
                # zero-screen payloads from broken encoders: take
                # the first frame's extent, like viewers do
                if sw == 0 or sh == 0:
                    sw, sh = left + iw, top + ih
                if sw * sh > 1 << 24:
                    raise ValueError(
                        "GIF canvas larger than the in-memory "
                        "decoder's 16M-pixel bound")
                canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
            if pos >= len(payload):
                raise ValueError("truncated GIF")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError("bad GIF LZW minimum code size")
            chunks = []
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += ln + 1
            pos += 1                       # block terminator
            data = b"".join(chunks)
            idx = np.array(_gif_lzw(data, min_code, iw * ih),
                           dtype=np.int64).reshape(ih, iw)
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            if idx.max() >= len(pal):
                raise ValueError("GIF index outside color table")
            px = pal[idx]
            if ipacked & 0x40:             # 4-pass interlace
                order = [y for step, start in
                         ((8, 0), (8, 4), (4, 2), (2, 1))
                         for y in range(start, ih, step)]
                disp = np.empty_like(px)
                disp[order] = px
                px = disp
                ilv = np.empty((ih, iw), dtype=np.int64)
                ilv[order] = idx
                idx = ilv
            # clip a rect overhanging the logical screen (broken
            # encoders; viewers clip rather than reject)
            vh = min(ih, sh - top)
            vw = min(iw, sw - left)
            if vh <= 0 or vw <= 0:
                # entirely off-canvas: displays nothing, still a frame
                yield k, canvas
                transp, disposal = None, 0
                k += 1
                continue
            px, idx = px[:vh, :vw], idx[:vh, :vw]
            region = canvas[top:top + vh, left:left + vw]
            prev = region.copy() if disposal == 3 else None
            if transp is not None:
                mask = idx != transp
                region[mask] = px[mask]
            else:
                region[:] = px
            yield k, canvas
            # dispose AFTER the displayed step, before the next frame
            if disposal == 2:
                region[:] = bg
            elif disposal == 3:
                region[:] = prev
            transp, disposal = None, 0
            k += 1
        elif b == 0x3B:                    # trailer
            if k == 0:
                raise ValueError("GIF contains no image")
            return
        else:
            raise ValueError("bad GIF block")
    raise ValueError("truncated GIF")


def _gif_pixels(payload: bytes, frame: int = 0):
    """Composited frame ``frame`` (0-based) of a GIF87a/89a as a
    top-down (h, w, 3) RGB uint8 array at the logical-screen size:
    logical screen descriptor, global/local color tables, LZW
    decompression, 4-pass interlace reorder — and, for animations,
    full frame COMPOSITING via ``_gif_frame_iter`` (offsets, GCE
    transparency, disposal methods 2/3) — so frame N is what a
    viewer displays at step N, not the raw partial delta most
    animation frames store. Raises ValueError on anything malformed
    or a frame index past the animation's end."""
    k = -1
    for k, canvas in _gif_frame_iter(payload):
        if k == frame:
            return canvas
    raise ValueError(
        f"GIF has only {k + 1} frame(s); frame {frame} requested")


def gif_n_frames(payload: bytes) -> int:
    """Count an animation's frames WITHOUT LZW-decoding them — one
    linear block scan (image descriptors + sub-block skips), the
    cheap bound ``sample_gif_frames`` sizes its per-asset fan-out
    with. Raises ValueError on a malformed container."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF")
    pos, k = 13, 0
    if payload[10] & 0x80:
        pos += 3 * (2 << (payload[10] & 7))
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 7))
            pos += 1                       # LZW minimum code size
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
            k += 1
        elif b == 0x3B:
            break
        else:
            raise ValueError("bad GIF block")
    if k == 0:
        raise ValueError("GIF contains no image")
    return k


def decode_gif(payload: bytes) -> list[float]:
    """REAL GIF decode (87a/89a first frame, LZW + interlace, pure
    stdlib + numpy — r12, flipping a plug-in-slot container to the
    real set): same 8-dim contract as decode_bmp/decode_png/
    decode_jpeg: [width, height, channels, mean_R, mean_G, mean_B
    (0..1), brightness (0..1), n_pixels]."""
    px = _gif_pixels(payload)
    h, w = px.shape[0], px.shape[1]
    means = px.astype("float64").mean(axis=(0, 1)) / 255.0
    return [float(w), float(h), 3.0,
            round(float(means[0]), 6), round(float(means[1]), 6),
            round(float(means[2]), 6),
            round(float(means.mean()), 6), float(w * h)]


def _image_pixels(payload: bytes):
    """Container-sniffing pixel getter for the perceptual-hash path:
    top-down (h, w, 3) uint8 from BMP (BGR), PNG (RGB), baseline
    JPEG (RGB), or GIF (RGB, r12). Channel order is irrelevant to dHash (it pools to
    grayscale), so the containers produce IDENTICAL fingerprints for
    identical pixel content — a PNG re-encode of a BMP dedups against
    it (JPEG's dHash survives its quantization loss on smooth
    content; sharp-edge content can flip border bits, which the
    hamming threshold absorbs)."""
    if payload[:2] == b"BM":
        return _bmp_pixels(payload)
    if payload[:8] == _PNG_SIG:
        return _png_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        return _jpeg_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_pixels(payload)
    if payload[:2] in (b"II", b"MM"):
        return _tiff_pixels(payload)
    raise ValueError("no decodable image container")


def _decode_image(payload: bytes) -> list[float]:
    """Codec-library slot for formats beyond the wired
    BMP/PNG/JPEG/GIF/TIFF kernels (WebP, AVIF, arithmetic-coded
    JPEG, JPEG-in-TIFF, ...). Real deployments
    plug PIL/opencv here; this container has no codec libraries, so
    reaching this is a decode MISS (the caller falls back and marks
    decode_ok=false)."""
    import PIL.Image  # noqa: F401  (not present in this container)
    raise NotImplementedError("real compressed-image decode not wired")


def _byte_histogram(payload: bytes) -> list[float]:
    """Deterministic pseudo-feature for undecodable payloads: byte
    histogram over 8 buckets, normalized."""
    if not payload:
        return [0.0] * 8
    hist = [0] * 8
    for b in payload:
        hist[b % 8] += 1
    n = float(len(payload))
    return [h / n for h in hist]


def _decode_any(raw: bytes) -> tuple[list[float], bool]:
    """Container-sniffing dispatch: real BMP/WAV kernels first, then
    the pluggable compressed-codec slot, else the histogram fallback
    with decode_ok=False."""
    if raw[:2] == b"BM":
        try:
            return decode_bmp(raw), True
        except ValueError:
            pass
    if raw[:4] == b"RIFF":
        try:
            return decode_wav(raw), True
        except ValueError:
            pass
    if raw[:8] == _PNG_SIG:
        try:
            return decode_png(raw), True
        except ValueError:
            pass
    if raw[:2] == b"\xff\xd8":
        try:
            return decode_jpeg(raw), True
        except ValueError:
            # arithmetic-coded/lossless/corrupt/truncated JPEG (the
            # kernel converts its internal IndexErrors): histogram
            # fallback
            pass
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return decode_gif(raw), True
        except ValueError:
            pass
    if raw[:2] in (b"II", b"MM"):
        try:
            return decode_tiff(raw), True
        except ValueError:
            # still-unsupported TIFF classes (JPEG-in-TIFF, planar=2,
            # mixed/other bit depths — tiled and 16-bit decode for
            # real since r14): histogram fallback like every other
            # plug-in-slot format
            pass
    try:
        return _decode_image(raw), True
    except (ImportError, NotImplementedError):
        return _byte_histogram(raw), False


def _sniff_container(raw: bytes) -> str:
    """Container label from the payload's magic bytes — the SAME
    prefixes ``_decode_any`` dispatches on (a gauge that sniffed
    differently from the dispatcher would misattribute real/fallback
    rates), with RIFF refined by its form type (WAVE vs WEBP vs
    other — all three hit the WAV kernel attempt, but a webp corpus
    reading 0% real under 'wav' would point at the wrong missing
    codec)."""
    if not raw:
        return "empty"
    if raw[:2] == b"BM":
        return "bmp"
    if raw[:4] == b"RIFF":
        form = raw[8:12]
        if form == b"WAVE":
            return "wav"
        if form == b"WEBP":
            return "webp"
        return "riff"
    if raw[:8] == _PNG_SIG:
        return "png"
    if raw[:2] == b"\xff\xd8":
        return "jpeg"
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if raw[:2] in (b"II", b"MM"):
        return "tiff"
    return "other"


def decode_coverage(assets: DataFrame) -> DataFrame:
    """Production decode-coverage gauge (VERDICT r13 #5): real-decode
    vs histogram-fallback rate per sniffed container over an ASSET
    corpus — the measured answer to "what fraction of this corpus do
    the wired codecs actually decode", turning the fixture number in
    ``tools/decode_coverage.py`` into an operator a 100 TB deployment
    runs on its own data (typically a sample: the gauge must DECODE
    to learn real-vs-fallback, so it costs one ``extract_features``-
    class Arrow pass).

    One mapInPandas stage emitting (container, decode_ok) per asset
    — pixels never shuffle — then one bounded groupBy (≤ 9 container
    rows). Returns (container, n_assets, n_real, n_fallback,
    real_rate), ordered by container."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            containers, ok = [], []
            for payload in pdf["content"]:
                raw = bytes(payload) if payload is not None else b""
                containers.append(_sniff_container(raw))
                _, o = _decode_any(raw)
                ok.append(o)
            yield pd.DataFrame({"container": containers,
                                "decode_ok": ok})

    per = _spread(assets).mapInPandas(
        run, "container string, decode_ok boolean")
    return (per.groupBy("container")
            .agg(F.count("*").alias("n_assets"),
                 F.sum(F.col("decode_ok").cast("long"))
                 .alias("n_real"),
                 F.sum((~F.col("decode_ok")).cast("long"))
                 .alias("n_fallback"))
            .select("container", "n_assets", "n_real", "n_fallback",
                    F.round(F.try_divide(F.col("n_real"),
                                         F.col("n_assets")), 6)
                    .alias("real_rate"))
            .orderBy("container"))


def decode_coverage_stream(spark, src_dir: str,
                           sink_dir: str | None = None,
                           checkpoint_dir: str | None = None,
                           timeout_s: int | None = 120) -> DataFrame:
    """Streaming decode-coverage monitor (r14 — the
    ``divergence_stream`` drift posture for the codec gauge): each
    micro-batch of an ASSET stream runs the row-local
    ``decode_coverage`` pass and emits its per-container gauge rows
    tagged with batch_id — so a production ingest watches its
    real-decode rate move batch over batch (a new container
    appearing, a codec regression, a corrupt shard). The emission
    is BOUNDED by construction (batches × ≤9 container rows):
    driver state never grows with the assets.

    Summing n_assets/n_real/n_fallback across batches replays the
    batch gauge of the union exactly (decode is row-local; pinned
    by test) — real_rate is per (batch, container), recompute it
    from the sums for a corpus-wide rate. ``sink_dir`` parquet-
    appends the gauge history (checkpointed, at-least-once);
    without it the rows accumulate driver-side and return directly
    (the test rig — same bounded size either way)."""
    from .util import stream_parquet

    stream = stream_parquet(spark, src_dir)
    rows: list = []

    def per_batch(bdf, bid):
        g = decode_coverage(bdf).withColumn(
            "batch_id", F.lit(int(bid)).cast("long")).select(
            "batch_id", "container", "n_assets", "n_real",
            "n_fallback", "real_rate")
        if sink_dir is not None:
            g.write.mode("append").parquet(sink_dir)
        else:
            rows.extend(g.collect())

    w = stream.writeStream.foreachBatch(per_batch)
    if sink_dir is not None:
        w = w.option("checkpointLocation",
                     checkpoint_dir or sink_dir + "__checkpoint")
    q = w.trigger(availableNow=True).start()
    if timeout_s is None:
        q.awaitTermination()
    elif not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"decode_coverage_stream did not finish within "
            f"{timeout_s}s — the gauge history may be partial; "
            f"restart resumes from the checkpoint")
    schema = ("batch_id long, container string, n_assets long, "
              "n_real long, n_fallback long, real_rate double")
    if sink_dir is not None:
        return spark.read.schema(schema).parquet(sink_dir)
    return spark.createDataFrame(rows, schema)


def extract_features(assets: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column: ONE
    mapInPandas stage, container-sniffed per payload. BMP/WAV decode
    for real (pure Python + numpy); other containers yield the
    deterministic histogram pseudo-feature with decode_ok=false."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok, nb = [], [], []
            for payload in pdf["content"]:
                raw = bytes(payload) if payload is not None else b""
                nb.append(len(raw))
                f, o = _decode_any(raw)
                feats.append(f)
                ok.append(o)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": nb,
                "feature": feats,
                "decode_ok": ok,
            })

    return _spread(assets).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode —
    pure relational expansion (sequence+explode), ready to feed a
    decode stage. Demonstrates bounded fan-out at scale.
    ``sample_gif_frames`` is the REAL end-to-end realization for the
    one multi-frame container this repo decodes natively."""
    frames = F.sequence(F.lit(0), F.greatest(
        (F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
    return (assets.where(F.col("modality") == "video")
            .select("asset_id",
                    F.explode(frames).alias("frame_idx"))
            .withColumn("t_ms", F.col("frame_idx") * every_ms))


def sample_gif_frames(assets: DataFrame, every_n: int = 1,
                      max_frames: int = 64) -> DataFrame:
    """REAL multi-frame sampling (r13): decode every ``every_n``-th
    COMPOSITED frame of each animated GIF payload to the standard
    8-dim image feature — the end-to-end realization of
    ``frame_sample_plan``'s decode stage for the one multi-frame
    container decodable in pure stdlib+numpy. One Arrow mapInPandas
    stage, same posture as ``extract_features``: a payload that is
    not a decodable GIF degrades to ONE row (frame_idx 0, histogram
    fallback, decode_ok=false), never a crash; per-asset fan-out is
    bounded by ``max_frames`` sampled frames (the cheap
    ``gif_n_frames`` block scan sizes it without LZW-decoding
    anything). Returns (asset_id, frame_idx, n_frames, feature,
    decode_ok)."""
    if every_n < 1:
        raise ValueError("sample_gif_frames: every_n must be >= 1")
    if max_frames < 1:
        raise ValueError("sample_gif_frames: max_frames must be "
                         ">= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "n_frames": [],
                   "feature": [], "decode_ok": []}
            for aid, payload in zip(pdf["asset_id"], pdf["content"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    nf = gif_n_frames(raw)
                    wanted = set(
                        list(range(0, nf, every_n))[:max_frames])
                    last = max(wanted)
                    feats = []
                    # ONE decode pass for the whole animation
                    # (review r13: per-frame _gif_pixels calls were
                    # O(frames²) LZW work)
                    for fi, px in _gif_frame_iter(raw):
                        if fi > last:
                            break
                        if fi not in wanted:
                            continue
                        h, w = px.shape[0], px.shape[1]
                        means = (px.astype("float64")
                                 .mean(axis=(0, 1)) / 255.0)
                        feats.append((fi, [
                            float(w), float(h), 3.0,
                            round(float(means[0]), 6),
                            round(float(means[1]), 6),
                            round(float(means[2]), 6),
                            round(float(means.mean()), 6),
                            float(w * h)]))
                except ValueError:
                    nf, feats = 0, None
                if feats is None:
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(0)
                    out["n_frames"].append(0)
                    out["feature"].append(_byte_histogram(raw))
                    out["decode_ok"].append(False)
                else:
                    for fi, f in feats:
                        out["asset_id"].append(aid)
                        out["frame_idx"].append(fi)
                        out["n_frames"].append(nf)
                        out["feature"].append(f)
                        out["decode_ok"].append(True)
            yield pd.DataFrame(out)

    return _spread(assets).mapInPandas(
        run, "asset_id long, frame_idx int, n_frames int, "
             "feature array<double>, decode_ok boolean")


def image_dhash(assets: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual difference-hash over decodable images: BMP pixels →
    grayscale → average-pool to a (grid × grid+1) cell matrix → one
    bit per horizontal neighbor comparison = a 64-bit fingerprint
    (grid=8) that survives resizing, small edits, and brightness
    shifts — the standard image near-dup signature.  One Arrow
    mapInPandas pass over BMP, PNG, or baseline-JPEG payloads
    (container-sniffed; identical pixels hash identically across
    containers, so a PNG or JPEG re-encode dedups against its BMP
    source); other containers come back decode_ok=false with a null
    hash (plug real codecs into _image_pixels).  Returns
    (asset_id, dhash long, decode_ok)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, oks = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["content"]):
                ids.append(aid)
                try:
                    px = _image_pixels(bytes(payload))
                except (ValueError, TypeError):
                    hashes.append(None)
                    oks.append(False)
                    continue
                hashes.append(_dhash_of(px, grid))
                oks.append(True)
            yield pd.DataFrame({"asset_id": ids, "dhash": hashes,
                                "decode_ok": oks})

    return _spread(assets.select("asset_id", "content")).mapInPandas(
        run, "asset_id long, dhash long, decode_ok boolean")


def _dhash_of(px, grid: int = 8) -> int:
    """64-bit difference hash of a top-down (h, w, 3) uint8 array
    (grid=8): grayscale → average-pool to (grid × grid+1) cells via
    boundary index arrays (any input size) → one bit per horizontal
    neighbor comparison, packed to a signed int64. Shared by the
    whole-image and per-frame (r13) fingerprints so identical pixel
    content hashes identically whichever path produced it."""
    import numpy as np

    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ri = np.linspace(0, h, grid + 1, dtype=int)
    ci = np.linspace(0, w, grid + 2, dtype=int)
    cells = np.empty((grid, grid + 1))
    for i in range(grid):
        r0, r1 = ri[i], max(ri[i + 1], ri[i] + 1)
        band = gray[r0:r1]
        for j in range(grid + 1):
            c0, c1 = ci[j], max(ci[j + 1], ci[j] + 1)
            cells[i, j] = band[:, c0:c1].mean()
    bits = (cells[:, :-1] > cells[:, 1:]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:                    # to signed int64
        v -= 1 << 64
    return v


def gif_frame_dhash(assets: DataFrame, every_n: int = 1,
                    grid: int = 8,
                    max_frames: int = 64) -> DataFrame:
    """Per-FRAME perceptual fingerprints over animated GIFs (r13):
    every ``every_n``-th composited frame → the shared ``_dhash_of``
    kernel — the video-dedup signature table (one 64-bit hash per
    sampled frame). Same bounded fan-out and degrade-never-crash
    posture as ``sample_gif_frames``; undecodable payloads yield no
    rows (no fingerprint, no pair — matching image_near_dup_pairs'
    exclusion). Returns (asset_id, frame_idx, n_sampled, dhash)."""
    if every_n < 1:
        raise ValueError("gif_frame_dhash: every_n must be >= 1")
    if max_frames < 1:
        raise ValueError("gif_frame_dhash: max_frames must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [],
                   "n_sampled": [], "dhash": []}
            for aid, payload in zip(pdf["asset_id"], pdf["content"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    nf = gif_n_frames(raw)
                    wanted = set(
                        list(range(0, nf, every_n))[:max_frames])
                    last = max(wanted)
                    hs = []
                    # ONE decode pass per animation (review r13)
                    for fi, px in _gif_frame_iter(raw):
                        if fi > last:
                            break
                        if fi in wanted:
                            hs.append((fi, _dhash_of(px, grid)))
                except ValueError:
                    continue
                for fi, hv in hs:
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(fi)
                    out["n_sampled"].append(len(hs))
                    out["dhash"].append(hv)
            yield pd.DataFrame(out)

    return _spread(assets.select("asset_id", "content")).mapInPandas(
        run, "asset_id long, frame_idx int, n_sampled int, "
             "dhash long")


def animation_near_dup_pairs(assets: DataFrame, every_n: int = 1,
                             min_match_frac: float = 0.8,
                             max_hash_df: int = 100) -> DataFrame:
    """Animation-level near-duplicate pairs (r13 — the video
    analogue of image/audio near-dup): two animations are near-dups
    when at least ``min_match_frac`` of the shorter one's sampled
    frames find an exact dHash match in the other (a GIF re-encode
    of the same animation matches every frame — identical pixels
    hash identically through the shared kernel).

    Scale shape: ONE equi-join of the per-(asset, dhash) DISTINCT
    signature table with itself on the 64-bit hash — never all-pairs
    of animations, never pixel data across a shuffle. ``max_hash_df``
    drops hashes appearing in more than that many assets before the
    join (stop-frames: black/intro/credit frames shared corpus-wide
    would otherwise hot-spot the join key — the same max-df cap the
    text shingle path applies). Returns (asset_a, asset_b,
    n_matched, match_frac)."""
    if not 0 < min_match_frac <= 1:
        raise ValueError("animation_near_dup_pairs: min_match_frac "
                         "must be in (0, 1]")
    sig = (gif_frame_dhash(assets, every_n=every_n)
           .select("asset_id", "dhash").distinct())
    hot = (sig.groupBy("dhash")
           .agg(F.count("*").alias("__df"))
           .where(F.col("__df") > max_hash_df)
           .select("dhash"))
    pruned = sig.join(F.broadcast(hot), "dhash", "left_anti")
    # denominators from the PRUNED table (review r13): counting
    # pre-pruning hashes made two identical animations sharing
    # corpus-hot stop-frames read match_frac < 1 and miss the pair
    per_asset = pruned.groupBy("asset_id").agg(
        F.count("*").alias("__n"))
    a = pruned.select(F.col("asset_id").alias("asset_a"), "dhash")
    b = pruned.select(F.col("asset_id").alias("asset_b"), "dhash")
    matched = (a.join(b, "dhash")
               .where(F.col("asset_a") < F.col("asset_b"))
               .groupBy("asset_a", "asset_b")
               .agg(F.count("*").alias("n_matched")))
    na = per_asset.select(F.col("asset_id").alias("asset_a"),
                          F.col("__n").alias("__na"))
    nb = per_asset.select(F.col("asset_id").alias("asset_b"),
                          F.col("__n").alias("__nb"))
    frac = F.round(F.col("n_matched")
                   / F.least("__na", "__nb"), 6)
    return (matched.join(na, "asset_a").join(nb, "asset_b")
            .select("asset_a", "asset_b", "n_matched",
                    frac.alias("match_frac"))
            .where(F.col("match_frac") >= min_match_frac))


def image_near_dup_pairs(assets: DataFrame,
                         max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs: dHash fingerprints through the
    SAME 4-band pigeonhole Hamming join the text SimHash path uses
    (llm/dedup.hamming_pairs) — one banded self-join over 64-bit
    signatures, never all-pairs pixel comparison.  Undecodable
    payloads are excluded (no fingerprint, no pair)."""
    from .dedup import hamming_pairs

    sig = image_dhash(assets).where(F.col("decode_ok"))
    return hamming_pairs(sig, sig_col="dhash", id_col="asset_id",
                         max_hamming=max_hamming)


def audio_fingerprint(assets: DataFrame, windows: int = 65) -> DataFrame:
    """Perceptual audio fingerprint: mono samples → RMS energy over
    ``windows`` equal slices → one bit per neighboring-window energy
    comparison = a 64-bit envelope hash (windows=65). Gain-invariant
    (comparisons survive any global volume scaling) and robust to
    re-encoding at a different rate — the audio analogue of the image
    dHash, riding the same banded Hamming join.  One Arrow
    mapInPandas pass; non-PCM payloads come back decode_ok=false.
    Returns (asset_id, afp long, decode_ok)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, oks = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["content"]):
                ids.append(aid)
                try:
                    mono, _, _, _ = _wav_samples(bytes(payload))
                except (ValueError, TypeError):
                    fps.append(None)
                    oks.append(False)
                    continue
                bounds = np.linspace(0, mono.size, windows + 1,
                                     dtype=int)

                def _rms(i):
                    seg = mono[bounds[i]:max(bounds[i + 1],
                                             bounds[i] + 1)]
                    # clips shorter than `windows` samples leave
                    # trailing slices empty — silent 0, not NaN
                    if seg.size == 0:
                        return 0.0
                    return float(np.sqrt((seg ** 2).mean()))

                env = np.array([_rms(i) for i in range(windows)])
                bits = env[:-1] > env[1:]
                v = 0
                for b in bits:
                    v = (v << 1) | int(b)
                if v >= 1 << 63:
                    v -= 1 << 64
                fps.append(v)
                oks.append(True)
            yield pd.DataFrame({"asset_id": ids, "afp": fps,
                                "decode_ok": oks})

    return _spread(assets.select("asset_id", "content")).mapInPandas(
        run, "asset_id long, afp long, decode_ok boolean")


def audio_near_dup_pairs(assets: DataFrame,
                         max_hamming: int = 3) -> DataFrame:
    """Audio near-duplicate pairs: envelope fingerprints through the
    shared 4-band pigeonhole Hamming join (llm/dedup.hamming_pairs).
    Sample data never crosses a shuffle — only 64-bit signatures."""
    from .dedup import hamming_pairs

    sig = audio_fingerprint(assets).where(F.col("decode_ok"))
    return hamming_pairs(sig, sig_col="afp", id_col="asset_id",
                         max_hamming=max_hamming)


def asset_dedup(assets: DataFrame, modality: str = "image",
                max_hamming: int | None = None) -> DataFrame:
    """Perceptual asset dedup end-to-end: fingerprint pairs (image
    dHash, audio envelope, or — r13 — animation frame-hash matching
    for 'video') → connected components (large-star/small-star) →
    one canonical survivor per cluster (min asset_id). Returns the
    surviving asset rows — the media analogue of the text near-dup
    collapse, on the same clustering machinery.

    ``max_hamming`` (default 3) tunes the image/audio Hamming join;
    animation matching is exact per frame, so passing it with
    'video' is a loud error (review r13 — the loud-flag contract),
    not a silently dropped knob."""
    from .dedup import near_dup_clusters

    if modality not in ("image", "audio", "video"):
        # a typo would otherwise ride the audio path, fail every
        # decode, and silently report zero duplicates (review r6)
        raise ValueError(f"asset_dedup supports modality 'image', "
                         f"'audio' or 'video', got {modality!r}")
    if modality == "video" and max_hamming is not None:
        raise ValueError(
            "asset_dedup: max_hamming applies to the image/audio "
            "fingerprint joins; animation matching is exact per "
            "frame — tune animation_near_dup_pairs' every_n/"
            "min_match_frac instead")
    mh = 3 if max_hamming is None else max_hamming
    sel = assets.where(F.col("modality") == modality)
    if modality == "image":
        pairs = image_near_dup_pairs(sel, mh)
    elif modality == "audio":
        pairs = audio_near_dup_pairs(sel, mh)
    else:
        # the multi-frame container decodable here is animated GIF;
        # other video containers have no fingerprint kernel (the
        # documented plug-in slot) and produce no pairs → singletons
        pairs = (animation_near_dup_pairs(sel)
                 .select(F.col("asset_a").alias("id_a"),
                         F.col("asset_b").alias("id_b")))
    clusters = near_dup_clusters(
        sel.select(F.col("asset_id")), pairs, id_col="asset_id")
    keep = (clusters.where(F.col("is_canonical"))
            .select(F.col("doc_id").alias("asset_id")))
    return sel.join(keep, "asset_id", "left_semi")
