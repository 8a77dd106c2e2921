"""Pure-Python BMP codec (stdlib ``struct`` only) — the third REAL image
format for the multimodal operators, alongside PNG (util/png.py) and
baseline JPEG (util/jpeg.py).

Scope: uncompressed 24-bit (BGR) Windows BMP — BITMAPFILEHEADER +
BITMAPINFOHEADER (BI_RGB), bottom-up or top-down row order, 4-byte row
padding. Lossless, so decode(encode(x)) == x bit-exactly (the p69 oracle
anchor's property). Out-of-scope variants (palettes, 1/4/8/16/32-bit,
RLE compression, V4/V5 headers beyond the core 40-byte info block)
raise ``BmpFormatError`` rather than mis-decoding.

BMP file format: public Microsoft/Windows specification (BITMAPFILEHEADER
/ BITMAPINFOHEADER layouts).
"""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, ...


class BmpFormatError(ValueError):
    pass


def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw 8-bit interleaved RGB pixels (row-major, top-down,
    ``width*height*3`` bytes) into a standards-valid 24-bit BMP
    (bottom-up rows, BGR byte order, 4-byte row padding)."""
    if len(pixels) != width * height * 3:
        raise BmpFormatError(
            f"pixel buffer is {len(pixels)} bytes; expected {width * height * 3}"
        )
    if width <= 0 or height <= 0:
        raise BmpFormatError(f"bad dimensions: {width}x{height}")
    stride = width * 3
    pad = (-stride) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray(pixels[y * stride : (y + 1) * stride])
        row[0::3], row[2::3] = row[2::3], row[0::3]  # RGB -> BGR
        rows.append(bytes(row) + b"\x00" * pad)
    data = b"".join(rows)
    offset = _FILE_HDR.size + _INFO_HDR.size
    file_hdr = _FILE_HDR.pack(BMP_MAGIC, offset + len(data), 0, 0, offset)
    # 2835 ppm ~= 72 DPI, the conventional default resolution fields
    info_hdr = _INFO_HDR.pack(40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + data


def bmp_meta(blob: bytes) -> tuple[int, int, int]:
    """Header-only probe: (width, height, channels)."""
    w, h, _, _ = _parse_headers(blob)
    return w, abs(h), 3


def _parse_headers(blob: bytes) -> tuple[int, int, int, int]:
    """Returns (width, signed_height, data_offset, file_declared_size)."""
    if blob[:2] != BMP_MAGIC:
        raise BmpFormatError("not a BMP (missing BM magic)")
    if len(blob) < _FILE_HDR.size + _INFO_HDR.size:
        raise BmpFormatError("truncated BMP header")
    _, fsize, _, _, offset = _FILE_HDR.unpack_from(blob)
    isize, w, h, planes, bpp, comp = _INFO_HDR.unpack_from(blob, _FILE_HDR.size)[:6]
    if isize < 40:
        raise BmpFormatError(f"unsupported info-header size {isize}")
    if planes != 1:
        raise BmpFormatError(f"bad plane count {planes}")
    if bpp != 24:
        raise BmpFormatError(f"only 24-bit BMP supported (got {bpp}-bit)")
    if comp != 0:
        raise BmpFormatError(f"only uncompressed (BI_RGB) supported (got {comp})")
    if w <= 0 or h == 0:
        raise BmpFormatError(f"bad dimensions: {w}x{h}")
    return w, h, offset, fsize


def decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP → (width, height, RGB pixels,
    row-major top-down)."""
    w, h, offset, _ = _parse_headers(blob)
    height, bottom_up = (h, True) if h > 0 else (-h, False)
    stride = w * 3
    padded = stride + ((-stride) % 4)
    if len(blob) < offset + padded * height:
        raise BmpFormatError("truncated BMP pixel data")
    out = bytearray(stride * height)
    for i in range(height):
        src = offset + i * padded
        y = (height - 1 - i) if bottom_up else i
        row = bytearray(blob[src : src + stride])
        row[0::3], row[2::3] = row[2::3], row[0::3]  # BGR -> RGB
        out[y * stride : (y + 1) * stride] = row
    return w, height, bytes(out)
