"""util/bmp.py — pure-Python 24-bit uncompressed BMP codec (the third real
image format next to PNG and baseline JPEG). Lossless: round trips are
bit-exact; structure pinned against the public BITMAPFILEHEADER /
BITMAPINFOHEADER layouts; out-of-scope variants raise."""

from __future__ import annotations

import struct

import pytest

from duckdb_cloudflare_spark.util import bmp as B


class TestRoundTrip:
    @pytest.mark.parametrize("dims", [(1, 1), (3, 2), (4, 4), (5, 3), (13, 9)])
    def test_bit_exact(self, dims):
        w, h = dims
        px = bytes(range(256)) * ((w * h * 3) // 256 + 1)
        px = px[: w * h * 3]
        blob = B.encode_bmp(px, w, h)
        assert B.decode_bmp(blob) == (w, h, px)

    def test_odd_width_padding(self):
        # stride 3*3=9 → 3 pad bytes per row; the padding must be present
        # in the file and absent from the decode.
        px = bytes(3 * 3 * 2)
        blob = B.encode_bmp(px, 3, 2)
        assert len(blob) == 14 + 40 + 2 * 12  # two padded 12-byte rows
        assert B.decode_bmp(blob)[2] == px

    def test_top_down_height_negative(self):
        # A top-down file (negative height) decodes to the same row order
        # as our bottom-up encode of the same pixels.
        px = bytes([i % 256 for i in range(4 * 2 * 3)])
        blob = bytearray(B.encode_bmp(px, 4, 2))
        # flip to top-down: negate height and reverse the (unpadded) rows
        struct.pack_into("<i", blob, 22, -2)
        stride = 12
        r0 = bytes(blob[54 : 54 + stride])
        r1 = bytes(blob[54 + stride : 54 + 2 * stride])
        blob[54 : 54 + stride], blob[54 + stride : 54 + 2 * stride] = r1, r0
        assert B.decode_bmp(bytes(blob)) == (4, 2, px)


class TestStructure:
    def test_header_layout(self):
        blob = B.encode_bmp(bytes(12), 2, 2)
        assert blob[:2] == b"BM"
        offset = struct.unpack_from("<I", blob, 10)[0]
        assert offset == 54  # 14-byte file header + 40-byte info header
        isize, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
        assert (isize, w, h, planes, bpp, comp) == (40, 2, 2, 1, 24, 0)
        assert struct.unpack_from("<I", blob, 2)[0] == len(blob)

    def test_bgr_order_and_bottom_up(self):
        # one red pixel (RGB 255,0,0) at TOP-left of a 1x2 image must land
        # in the LAST row of the file as BGR 00 00 FF.
        px = bytes([255, 0, 0]) + bytes([0, 0, 255])
        blob = B.encode_bmp(px, 1, 2)
        rows = blob[54:]
        assert rows[:3] == bytes([255, 0, 0])  # bottom row first: blue pixel BGR
        assert rows[4 : 7] == bytes([0, 0, 255])  # then red pixel as BGR

    def test_meta_probe(self):
        assert B.bmp_meta(B.encode_bmp(bytes(36), 4, 3)) == (4, 3, 3)


class TestContracts:
    def test_not_bmp(self):
        with pytest.raises(B.BmpFormatError, match="magic"):
            B.decode_bmp(b"PNG" + bytes(60))

    def test_unsupported_bpp(self):
        blob = bytearray(B.encode_bmp(bytes(12), 2, 2))
        struct.pack_into("<H", blob, 28, 8)
        with pytest.raises(B.BmpFormatError, match="24-bit"):
            B.decode_bmp(bytes(blob))

    def test_compressed_raises(self):
        blob = bytearray(B.encode_bmp(bytes(12), 2, 2))
        struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
        with pytest.raises(B.BmpFormatError, match="uncompressed"):
            B.decode_bmp(bytes(blob))

    def test_truncated_pixels_raise(self):
        blob = B.encode_bmp(bytes(48), 4, 4)
        with pytest.raises(B.BmpFormatError, match="truncated"):
            B.decode_bmp(blob[:-8])

    def test_wrong_buffer_size_raises(self):
        with pytest.raises(B.BmpFormatError, match="expected"):
            B.encode_bmp(bytes(10), 2, 2)


class TestOperatorWiring:
    def test_asset_meta_recognizes_bmp(self):
        from duckdb_cloudflare_spark.operators.multimodal import decode_asset_meta

        meta = decode_asset_meta(B.encode_bmp(bytes(5 * 3 * 3), 5, 3))
        assert meta["mime"] == "image/bmp"
        assert (meta["width"], meta["height"], meta["channels"]) == (5, 3, 3)

    def test_decode_with_real_codec_routes_bmp(self):
        from duckdb_cloudflare_spark.operators.multimodal import decode_with_real_codec

        px = bytes(range(48))
        assert decode_with_real_codec(B.encode_bmp(px, 4, 4)) == (4, 4, 3, px)

    def test_resize_bmp_roundtrip(self):
        from duckdb_cloudflare_spark.operators.multimodal import _resize_bytes

        px = bytes([7, 8, 9]) * 16
        out = _resize_bytes(B.encode_bmp(px, 4, 4), 2, 2)
        assert B.decode_bmp(out) == (2, 2, bytes([7, 8, 9]) * 4)
