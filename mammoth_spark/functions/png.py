"""Pure-stdlib PNG codec (zlib + full filter set incl. Paeth).

Closes the multimodal real-codec gap for COMPRESSED images (VERDICT r06
#6): the container ships no image libraries, so until now only the
uncompressed PPM path could prove the mapInPandas injection points
carry real pixels. PNG is stdlib-decodable — zlib inflate + per-line
unfiltering — so `media_resize` / `media_features` can run genuine
compressed pixel data with zero dependencies. The md5 stand-ins remain
the ORACLE defaults (their outputs are cheap deterministic functions
the DuckDB side can mirror); these kernels are the real-data plug-ins,
exercised by an always-run test next to the PPM one.

Format per the public PNG specification (W3C/ISO 15948; RFC 2083):
signature, length-tagged CRC'd chunks, IHDR (width, height, bit depth,
color type), concatenated IDAT zlib stream, IEND. Supported subset:
8-bit depth, color types 0 (grayscale), 2 (RGB), 6 (RGBA), no
interlace — the shape real training corpora overwhelmingly use. All
five scanline filters (None/Sub/Up/Average/Paeth) are implemented in
both directions; the encoder can cycle filters per line so round-trip
tests exercise every unfilter branch.

Reference parity note: the reference engine has no image path at all —
this module belongs to the mandated beyond-reference multimodal
surface (driver brief), not to SURVEY Table A.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE = {"L": 0, "RGB": 2, "RGBA": 6}
_CHANNELS = {0: 1, 2: 3, 6: 4}
_MODE = {0: "L", 2: "RGB", 6: "RGBA"}


class PngError(ValueError):
    pass


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    # a = left, b = above, c = upper-left (spec §6.6)
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply filter ``ft`` to a raw scanline (encoder direction)."""
    out = bytearray(len(line))
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            out[i] = x
        elif ft == 1:
            out[i] = (x - a) & 0xFF
        elif ft == 2:
            out[i] = (x - b) & 0xFF
        elif ft == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ft == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise PngError(f"bad filter type {ft}")
    return bytes(out)


def _unfilter_line(ft: int, line: bytearray, prev: bytes, bpp: int) -> None:
    """Invert filter ``ft`` in place (decoder direction)."""
    if ft == 0:
        return
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 1:
            line[i] = (line[i] + a) & 0xFF
        elif ft == 2:
            line[i] = (line[i] + b) & 0xFF
        elif ft == 3:
            line[i] = (line[i] + (a + b) // 2) & 0xFF
        elif ft == 4:
            line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise PngError(f"bad filter type {ft}")


def png_encode(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGB",
    filter_cycle: bool = False,
) -> bytes:
    """Encode raw 8-bit pixels as a minimal valid PNG. ``filter_cycle``
    rotates through all five scanline filters (line y uses filter y%5)
    so a decoder round-trip covers every unfilter branch."""
    if mode not in _COLOR_TYPE:
        raise PngError(f"unsupported mode {mode}")
    bpp = len(mode) if mode != "L" else 1
    if len(pixels) != width * height * bpp:
        raise PngError("pixel buffer does not match dimensions")
    raw = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        line = pixels[y * width * bpp : (y + 1) * width * bpp]
        ft = (y % 5) if filter_cycle else 0
        raw.append(ft)
        raw += _filter_line(ft, line, prev, bpp)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[mode], 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def png_decode(content: bytes) -> tuple[int, int, str, bytes]:
    """Decode a PNG to (width, height, mode, raw pixel bytes).

    Verifies the signature and every chunk CRC; supports 8-bit
    grayscale/RGB/RGBA, non-interlaced; raises PngError otherwise."""
    if content[:8] != PNG_SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(content):
        if pos + 8 > len(content):
            raise PngError("truncated chunk header")
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(content):
            raise PngError("truncated chunk body")
        (crc,) = struct.unpack(">I", content[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise PngError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            if length != 13:
                raise PngError(f"IHDR length {length}, expected 13")
            ihdr = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        # ancillary chunks are skipped (spec-sanctioned)
        pos += 12 + length
    if ihdr is None:
        raise PngError("missing IHDR")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color not in _CHANNELS or comp != 0 or filt != 0:
        raise PngError(
            f"unsupported PNG shape (depth={depth}, color={color}) — "
            "this stdlib codec handles 8-bit gray/RGB/RGBA"
        )
    if interlace != 0:
        raise PngError("interlaced PNG not supported")
    bpp = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # missing/garbage IDAT must surface as the codec's own error
        # type — decode_image callers dispatch on PngError, not zlib
        raise PngError(f"corrupt IDAT stream: {exc}") from exc
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise PngError("decompressed size does not match dimensions")
    out = bytearray(height * stride)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        _unfilter_line(ft, line, prev, bpp)
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, _MODE[color], bytes(out)


# ------- real-pixel kernels pluggable into the mapInPandas stages -------


def png_resize_kernel(content: bytes, width: int, height: int) -> bytes:
    """Real decode -> nearest-neighbor resample -> re-encode, the PNG
    counterpart of the test PPM kernel, usable as
    ``resize_images(media, kernel=png_resize_kernel)``."""
    w, h, mode, raw = png_decode(content)
    bpp = len(mode) if mode != "L" else 1
    out = bytearray()
    for y in range(height):
        sy = y * h // height
        for x in range(width):
            sx = x * w // width
            i = (sy * w + sx) * bpp
            out += raw[i : i + bpp]
    return png_encode(width, height, bytes(out), mode)


def png_mean_rgb_extractor(content: bytes) -> list[float]:
    """Real feature: per-channel mean normalized to [-1, 1], usable as
    ``extract_features(media, extractor=png_mean_rgb_extractor)``."""
    w, h, mode, raw = png_decode(content)
    bpp = len(mode) if mode != "L" else 1
    n = w * h
    sums = [0] * bpp
    for i in range(0, len(raw), bpp):
        for ch in range(bpp):
            sums[ch] += raw[i + ch]
    return [((s / n) / 255.0) * 2 - 1 for s in sums]
