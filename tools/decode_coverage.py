#!/usr/bin/env python3
"""Measured decode coverage of the multimodal codec set
(VERDICT r11 #7): run ``extract_features`` over a mixed-container
fixture set — every container the repo decodes for real (BMP, WAV,
PNG variants, baseline/progressive JPEG) plus the documented
plug-in-slot formats (WebP, AVIF, GIF, arithmetic-coded JPEG,
truncated JPEG, random bytes) — and report the real-decode vs
histogram-fallback rate per container and overall. The numbers land
in docs/DIVERGENCES.md.

Run: python tools/decode_coverage.py
"""

import os
import struct
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from metacat_spark.session import get_spark


def _bmp(w, h, rgb_rows):
    stride = (w * 3 + 3) // 4 * 4
    pix = b""
    for row in reversed(rgb_rows):
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        pix += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                      2835, 2835, 0, 0)
    return header + dib + pix


def _wav(rate, samples):
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def _png_gray(rows):
    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))
    h, w = len(rows), len(rows[0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _gif(rows, interlace=False):
    """Minimal GIF89a fixture encoder (literal-code LZW mirroring the
    decoder's code-size growth) — same builder as the unit tests."""
    colors = sorted({c for row in rows for c in row})
    cmap = {c: i for i, c in enumerate(colors)}
    bits = max(1, (len(colors) - 1).bit_length())
    n_field = max(0, bits - 1)
    entries = 2 << n_field
    min_code = max(2, bits)
    h, w = len(rows), len(rows[0])
    if interlace:
        order = [y for step, start in ((8, 0), (8, 4), (4, 2), (2, 1))
                 for y in range(start, h, step)]
    else:
        order = range(h)
    flat = [cmap[c] for y in order for c in rows[y]]
    clear, end_code = 1 << min_code, (1 << min_code) + 1
    cs, nxt, first = min_code + 1, end_code + 1, True
    codes = [(clear, min_code + 1)]
    for idx in flat:
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
    gct = b"".join(bytes(c) for c in colors)
    gct += b"\x00" * (entries * 3 - len(gct))
    out = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | n_field,
                                   0, 0) + gct
           + b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
           + bytes([0x40 if interlace else 0, min_code]))
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + bytes(chunk)
    return out + b"\x00\x3B"


def _gif_anim(sw, sh, pal, frames):
    """Animated GIF89a fixture (r13): shared global color table,
    one image per (left, top, idx_rows, transp, disposal) entry,
    GCE per frame when transparency/disposal applies — same
    builder as the unit tests."""
    bits = max(1, (len(pal) - 1).bit_length())
    n_field = max(0, bits - 1)
    entries = 2 << n_field
    min_code = max(2, bits)
    gct = b"".join(bytes(c) for c in pal)
    gct += b"\x00" * (entries * 3 - len(gct))
    out = (b"GIF89a"
           + struct.pack("<HHBBB", sw, sh, 0x80 | n_field, 0, 0)
           + gct)
    for left, top, rows, transp, disposal in frames:
        h, w = len(rows), len(rows[0])
        if transp is not None or disposal:
            p = (disposal & 7) << 2 | (1 if transp is not None
                                       else 0)
            out += (b"\x21\xf9\x04"
                    + bytes([p, 0, 0, transp or 0]) + b"\x00")
        out += (b"\x2C" + struct.pack("<HHHH", left, top, w, h)
                + bytes([0, min_code]))
        flat = [i for r in rows for i in r]
        clear, end_code = 1 << min_code, (1 << min_code) + 1
        cs, nxt, first = min_code + 1, end_code + 1, True
        codes = [(clear, min_code + 1)]
        for idx in flat:
            codes.append((idx, cs))
            if first:
                first = False
            else:
                nxt += 1
                if nxt == (1 << cs) and cs < 12:
                    cs += 1
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
    return out + b"\x3B"


def _px(h, w):
    return [[((x * 7 + y * 13) % 256, (x * 3) % 256, (y * 5) % 256)
             for x in range(w)] for y in range(h)]


def _tiff_comp(payload, comp):
    """Rewrite a little-endian encode_tiff fixture's Compression tag
    (259) — builds the beyond-baseline (e.g. LZW=5) probe."""
    b = bytearray(payload)
    n = int.from_bytes(b[8:10], "little")
    for i in range(n):
        off = 10 + 12 * i
        if int.from_bytes(b[off:off + 2], "little") == 259:
            b[off + 8] = comp
    return bytes(b)


def main():
    from pyspark.sql import functions as F

    from metacat_spark.llm import multimodal as MM

    rows_888 = _px(8, 8)
    base = MM.encode_jpeg_baseline(rows_888)
    prog = MM.encode_jpeg_progressive(rows_888)
    # arithmetic-coded JPEG: baseline with SOF0 (0xC0) -> SOF9 (0xC9)
    arith = bytearray(base)
    i = arith.find(b"\xff\xc0")
    arith[i + 1] = 0xC9
    fixtures = [
        # (container, payload) — several payloads per real codec
        ("bmp", _bmp(2, 2, _px(2, 2))),
        ("bmp", _bmp(5, 3, _px(3, 5))),
        ("wav", _wav(8000, [0, 16384, -16384, 0])),
        ("wav", _wav(44100, list(range(-50, 50)))),
        ("png", _png_gray([[0, 128, 255], [10, 20, 30]])),
        ("png", _png_gray([[x % 256 for x in range(16)]
                           for _ in range(16)])),
        ("jpeg_baseline", base),
        ("jpeg_baseline", MM.encode_jpeg_baseline(rows_888,
                                                  sub="420")),
        ("jpeg_baseline", MM.encode_jpeg_baseline(
            [[(x * 17 + y * 29) % 256 for x in range(8)]
             for y in range(8)], sub="gray")),
        ("jpeg_progressive", prog),
        ("jpeg_progressive", MM.encode_jpeg_progressive(
            [[(x * 17 + y * 29) % 256 for x in range(8)]
             for y in range(8)], sub="gray")),
        # plug-in-slot / degraded containers — MUST fall back, not
        # crash
        ("gif", _gif([[(r % 256 // 32 * 32, 0, c % 256 // 32 * 32)
                       for c in range(6)] for r in range(5)])),
        ("gif", _gif([[(r % 256 // 32 * 32, 0, c % 256 // 32 * 32)
                       for c in range(6)] for r in range(9)],
                     interlace=True)),
        # animated: offsets + GCE transparency + disposal (r13 —
        # frame 1 real-decodes via extract_features; the full
        # per-frame path is sample_gif_frames, unit-tested)
        ("gif_animated", _gif_anim(
            6, 6, [(0, 0, 0), (255, 0, 0), (0, 255, 0)],
            [(0, 0, [[1] * 6 for _ in range(6)], None, 0),
             (2, 2, [[2, 0], [0, 2]], 0, 2),
             (0, 0, [[2] * 6], None, 0)])),
        ("gif_animated", _gif_anim(
            4, 4, [(0, 0, 0), (64, 64, 64)],
            [(0, 0, [[1] * 4 for _ in range(4)], None, 0),
             (1, 1, [[0, 1], [1, 0]], None, 3)])),
        # baseline TIFF (r13): both byte orders, PackBits, LZW (+
        # horizontal-differencing predictor), grayscale; JPEG-in-
        # TIFF (compression 7) stays a plug-in-slot fallback
        ("tiff", MM.encode_tiff(_px(4, 6))),
        ("tiff", MM.encode_tiff(_px(5, 3), endian=">",
                                packbits=True, rows_per_strip=2)),
        ("tiff", MM.encode_tiff([[x * 16 % 256 for x in range(8)]
                                 for _ in range(8)], gray=True)),
        ("tiff", MM.encode_tiff(_px(6, 5), lzw=True,
                                predictor=True, rows_per_strip=3)),
        # 16-bit (r14): big-endian RGB, and gray + LZW + predictor
        ("tiff", MM.encode_tiff(_px(4, 4), endian=">", depth=16)),
        ("tiff", MM.encode_tiff([[x * 16 % 256 for x in range(6)]
                                 for _ in range(5)], gray=True,
                                lzw=True, predictor=True,
                                depth=16)),
        # tiled (r14): padded edge tiles, per-tile compression
        ("tiff", MM.encode_tiff(_px(7, 5), tiles=(3, 2))),
        ("tiff", MM.encode_tiff(_px(6, 6), tiles=(4, 4), lzw=True,
                                predictor=True, depth=16)),
        ("tiff_jpeg", _tiff_comp(MM.encode_tiff(_px(4, 4)), 7)),
        ("webp", b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 "
         + b"\x00" * 12),
        ("avif", struct.pack(">I", 24) + b"ftypavif"
         + b"\x00" * 16),
        ("gif_corrupt", b"GIF89a" + b"\x00" * 30),
        ("jpeg_arithmetic", bytes(arith)),
        ("jpeg_truncated", base[: len(base) // 2]),
        ("random", bytes((i * 37 + 11) % 256 for i in range(64))),
        ("empty", b""),
    ]
    spark = get_spark("decode_coverage")
    assets = spark.createDataFrame(
        [(i, c, bytearray(p)) for i, (c, p) in enumerate(fixtures)],
        "asset_id long, modality string, content binary")
    feats = {r["asset_id"]: r["decode_ok"]
             for r in MM.extract_features(assets).collect()}
    by_container = {}
    for i, (c, _) in enumerate(fixtures):
        by_container.setdefault(c, []).append(feats[i])
    real_set = {"bmp", "wav", "png", "jpeg_baseline",
                "jpeg_progressive", "gif", "gif_animated", "tiff"}
    print(f"{'container':18} {'n':>3} {'real-decoded':>13}")
    n_real = n_all = 0
    for c, oks in by_container.items():
        print(f"{c:18} {len(oks):>3} {sum(oks):>6}/{len(oks)}")
        n_all += len(oks)
        n_real += sum(oks)
        want_real = c in real_set
        assert all(o == want_real for o in oks), (c, oks)
    print(f"overall: {n_real}/{n_all} payloads real-decoded "
          f"({n_real / n_all:.0%}); every real-codec container "
          f"decodes, every plug-in-slot container degrades to the "
          f"histogram fallback, nothing crashes")
    spark.stop()


if __name__ == "__main__":
    main()
